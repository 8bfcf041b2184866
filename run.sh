#!/bin/bash
# Canonical CLI invocations (rebuilds reference run.sh:1-24).
# --gpus selects the number of data-parallel TPU devices on the mesh.

# AVSS (semantics, 71 classes)
# python main_avss_resize.py --setup avss --gpus 1 --batch_size 16 --lr 1e-3 --resize_flag
# python main_avss.py        --setup avss --gpus 1 --batch_size 8  --lr 1e-3

# AVSS binary
# python main_avss_resize.py --setup avss_binary --gpus 1 --batch_size 16 --lr 1e-3 --resize_flag

# AVSBench-Object splits through the AVSS entry
# python main_avss_resize.py --setup avss --avsbench_split v1s --resize_flag
# python main_avss_resize.py --setup avss --avsbench_split v1m --resize_flag

# VPO mono
# python main_vpo_mono.py --setup vpo_ss   --gpus 2 --batch_size 16
# python main_vpo_mono.py --setup vpo_ms   --gpus 2 --batch_size 16
# python main_vpo_mono.py --setup vpo_msmi --gpus 2 --batch_size 16

# VPO stereo
# python main_vpo_stereo.py --setup vpo_ss   --gpus 2 --batch_size 16
# python main_vpo_stereo.py --setup vpo_ms   --gpus 2 --batch_size 16
# python main_vpo_stereo.py --setup vpo_msmi --gpus 2 --batch_size 16

# Checkpoint evaluation
# python test_avs_semantic.py --setup avss --resize_flag --ckpt_path ./avss_224.pth
# python test_avss_resize.py  --setup avss --avsbench_split v1s --resize_flag --ckpt_path ./cavp_avsobj_ss.pth
