"""Dual-metric early stopping.

Parity: mutils/classification.py:26-74 — primary metric (e.g. BAcc, greater
is better) with a secondary tie-breaker (e.g. val loss); patience counting
only begins at ``start_from``; returns True when the new value is the best.
"""


class EarlyStopping:
    def __init__(self, patience: int = 50, delta: float = 0.01,
                 greater_is_better: bool = False, delta_two: float = 0.01,
                 greater_is_better_two: bool = False, start_from: int = 0):
        self.patience = patience
        self.delta = delta
        self.delta_two = delta_two
        self.counter = 0
        self.best_value = None
        self.best_value_two = None
        self.early_stop = False
        self.start_from = start_from
        if greater_is_better:
            self.is_better = lambda x, y: (x - y) > self.delta
        else:
            self.is_better = lambda x, y: (y - x) > self.delta
        if greater_is_better_two:
            self.is_better_two = lambda x, y: (x - y) > self.delta_two
        else:
            self.is_better_two = lambda x, y: (y - x) > self.delta_two
        self.is_same = lambda x, y: abs(x - y) < self.delta

    def __call__(self, value, value_two, epoch) -> bool:
        """True if (value, value_two) is the new best."""
        if (self.best_value is None
                or self.is_better(value, self.best_value)
                or (self.is_same(value, self.best_value)
                    and self.is_better_two(value_two, self.best_value_two))):
            self.best_value = value
            self.best_value_two = value_two
            self.counter = 0
            return True
        if epoch >= self.start_from:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        return False
