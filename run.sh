#!/usr/bin/env bash
# Canonical invocations of the four workloads (parity: reference run.sh).
# Each block is independent; comment in what you need.

RUNNER="python -m mirage_tpu.cli.runner"

## Pretraining (1600 epochs, 3 modalities, Dirichlet-masked)
# python -m mirage_tpu.cli.run_pretraining \
#     -c configs/pretrain_mirage_98_1600e.yaml \
#     --data_path ./__datasets/Pretraining \
#     --weights ./__weights/multimae-b_98_rgb+-depth-semseg_1600e_multivit-afff3f8c.pth \
#     --output_dir ./__output/pretrain

## Segmentation tuning on every dataset x both model sizes
# $RUNNER "python -m mirage_tpu.cli.run_seg_tuning -c configs/seg_200e_convnext.yaml" \
#     --runners 1 -- \
#     --data_path ./__datasets/Segmentation/AROI ./__datasets/Segmentation/Duke_DME \
#                 ./__datasets/Segmentation/GOALS ./__datasets/Segmentation/RETOUCH \
#     --weights ./__weights/MIRAGE-Base.pth ./__weights/MIRAGE-Large.pth \
#     --test

## Offline volume-level segmentation evaluation (Dice/IoU/HD95 CSVs)
# python -m mirage_tpu.cli.run_seg_eval \
#     -d ./__datasets/Segmentation \
#     -m ./__output/seg/v1/AROI/MIRAGE-Base_frozen_convnext_CEGDice_minmax

## Classification tuning (linear probe) on every dataset
# $RUNNER "python -m mirage_tpu.cli.run_cls_tuning --data_root ./__datasets/Classification" \
#     --runners 1 -- \
#     --data_set Duke_iAMD GAMMA Harvard_Glaucoma Noor_Eye_Hospital OCTDL OCTID OLIVES \
#     --weights ./__weights/MIRAGE-Base.pth \
#     --linear_probing

## Inference on the bundled example triplet
# python -m mirage_tpu.cli.infer --weights ./__weights/MIRAGE-Base.pth \
#     --image_path ./_example_images

## Benchmark (one JSON line; --all adds the four training workloads and
## writes BENCH_TRAIN.json)
# python bench.py
# python bench.py --all
