#!/usr/bin/env bash
# Zero-shot K400 evaluation (reference eval_scripts/k400_eval.sh shape).
python -m gava_clip_tpu.cli.zero_shot \
    --type updrs \
    --text_prompt_classes_path "./classes/k400_classes.txt" \
    --backbone_path "./pretrained/clip_pretrained.pth" \
    --pretrained_vlm "./pretrained/ckpt_k400.pth" \
    --eval_data_root "datasets/kinetics-dataset/k400_resized/test" \
    --eval_list_path "datasets/kinetics-dataset/k400_resized/test_for_model.csv" \
    --batch_size 32 --num_frames 8 --num_workers 6 \
    --mean 0.48145466 0.4578275 0.40821073 \
    --std 0.26862954 0.26130258 0.27577711
