#!/bin/bash
# TULIP-large training on CARLA 32x2048 -> 128x2048 (TPU-native stack).

args=(
    --batch_size 8
    --epochs 600
    --num_workers 2
    --lr 5e-4
    --weight_decay 0.01
    --warmup_epochs 60
    --model_select tulip_large
    --pixel_shuffle
    --circular_padding
    --log_transform
    --patch_unmerging
    # Dataset
    --dataset_select carla
    --data_path_low_res ./dataset/Carla/
    --data_path_high_res ./dataset/Carla/
    # Logger
    --run_name tulip_large
    --entity myentity
    --project_name experiment_carla
    --output_dir ./experiment/carla/tulip_large
    --img_size_low_res 32 2048
    --img_size_high_res 128 2048
    --window_size 2 8
    --patch_size 1 4
    --in_chans 1
    )

torchrun --nproc_per_node=4 tulip/main_lidar_upsampling.py "${args[@]}"
