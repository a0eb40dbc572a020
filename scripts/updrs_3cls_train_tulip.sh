#!/usr/bin/env bash
# Flagship TULIP UPDRS 3-class LOSO training (reference
# train_scripts/updrs_3cls_train_tulip.sh configuration, TPU-native).
exp_dir=train_output/tulip_updrs
mkdir -p "${exp_dir}"
python -m gava_clip_tpu.cli.train \
    --nfold 10 --type updrs --data_root tulip \
    --text_prompt_classes_path "./classes/updrs_3cls_classes.txt" \
    --checkpoint_dir "${exp_dir}" --auto_resume \
    --num_steps 2000 --save_freq 2001 --eval_freq 40 \
    --batch_size 4 --num_frames 70 --spatial_size 224 \
    --backbone_path "./pretrained/clip_pretrained.pth" \
    --mean 0.48145466 0.4578275 0.40821073 \
    --std 0.26862954 0.26130258 0.27577711 \
    --lr 1e-4 --num_workers 6 --no_mirror \
    --use_text_prompt_learning --text_num_prompts 8 --use_text_prompt_CSC \
    --use_summary_token --use_local_prompts --use_global_prompts \
    --num_global_prompts 8 \
    --text_prompt_init "cntn_split_uni_disc" \
    --knowledge_version v1 --knowledge_version v2 --knowledge_version v3 \
    --knowledge_version v4 --knowledge_version v5 \
    --use_support_memory --memory_data_path "./data/gait/tulip_dict_basic_4f.pkl" \
    --clLoss_nte_video --use_focal_ordinal_loss --use_bf16 \
  2>&1 | tee "${exp_dir}/train-$(date +"%Y%m%d_%H%M%S").log"
