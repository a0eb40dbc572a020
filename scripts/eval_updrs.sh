#!/usr/bin/env bash
# Cross-fold re-evaluation of a finished run (reference eval_scripts/eval_updrs.sh).
python -m gava_clip_tpu.cli.evaluate \
    --checkpoint_dir "$1" \
    --data_root "${2:-datasets/tulip}" \
    --val_list_path "${2:-datasets/tulip}/val_updrs.csv" \
    --text_prompt_classes_path "./classes/updrs_3cls_classes.txt" \
    --batch_size 1 --num_frames 70 --sampling_rate 1
