#!/bin/bash
# Launch-script layer (parity: run_train.sh — the supported experiment
# configurations as one-liners; reference run_train.sh:81 is the paper
# config).  Uncomment the experiment to run.

# ---- the paper configuration: CT+pathology, CLIP text prompts, TransMIL
#      aggregator, tri-head loss + text cosine alignment, frozen pretrained
#      CT extractor (reference run_train.sh:81) ----
python scripts/train.py \
    --modality "['CT','pathology']" \
    --model_CT resnetMC3_18 --model_pathology TransMIL \
    --model_CI CLIP --CI_input_version text --CI_prompt_version devided \
    --learnablePrompt 1 --n_ctx 8 \
    --aggregator TransMIL --alignment_base CI \
    --loss BCE+textCosSim --loss_point CT-Pth-Last \
    --pretrainedExt_CT 1 --pretrainedExt_freeze 1 \
    --hospital_test "['EUMC','HUMC','SCHMC']" --val_fold 0 \
    --batch_size 2 --n_epochs 1000 --cos \
    "$@"

# ---- CT-only (the 0.8931-AUC configuration, run_test.sh:34) ----
# python scripts/train.py --modality "['CT']" --model_CT resnetMC3_18 \
#     --model_CI simpleFCs_v1 --aggregator ABMIL --loss_point Last \
#     --activationF sigmoid --learnablePrompt 0 "$@"

# ---- pathology-only ABMIL (minimum slice) ----
# python scripts/train.py --modality "['pathology']" \
#     --model_pathology ABMIL --aggregator ABMIL --model_CI simpleFCs_v1 \
#     --loss_point Last --learnablePrompt 0 "$@"

# ---- CI-only ablations (simpleFCs v1/v1d/v2/v2d or CLIP) ----
# python scripts/train.py --modality "['CI']" --model_CI simpleFCs_v2 \
#     --CI_input_version v2 --aggregator - --loss_point Last \
#     --learnablePrompt 0 "$@"

# ---- synthetic smoke run (no hospital data needed) ----
# python scripts/train.py --synthetic --modality "['pathology']" \
#     --model_pathology ABMIL --aggregator ABMIL --model_CI simpleFCs_v1 \
#     --loss_point Last --learnablePrompt 0 --n_epochs 3 "$@"
