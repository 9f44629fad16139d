"""String-keyed registries (capability parity with mutils/factory.py:5-36).

Used for model variants, FM configs, cls heads and seg adapters, keyed off
names or substrings of weight filenames, matching the reference's selection
mechanism (run_pretraining.py:405-411 etc.).
"""

from typing import Callable, Dict, Optional, Tuple


def get_factory_adder() -> Tuple[Callable, Dict[str, Callable]]:
    """Return (decorator, registry). The decorator registers a callable under
    its ``__name__`` or an explicit name::

        add_model, model_factory = get_factory_adder()

        @add_model
        def miragepre_base(...): ...

        @add_model('custom-name')
        def some_fn(...): ...
    """
    registry: Dict[str, Callable] = {}

    def adder(fn_or_name, name: Optional[str] = None):
        if isinstance(fn_or_name, str):
            # Used as @adder('name')
            key = fn_or_name

            def wrap(fn):
                registry[key] = fn
                return fn

            return wrap
        fn = fn_or_name
        registry[name or fn.__name__] = fn
        return fn

    return adder, registry
