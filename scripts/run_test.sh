#!/bin/bash
# Launch-script layer (parity: run_test.sh — external-hospital evaluation;
# the reference's active test config with its recorded decision threshold is
# run_test.sh:122, best_thres 0.4430 for the paper model fold 0).

python scripts/test.py \
    --mode test \
    --modality "['CT','pathology']" \
    --model_CT resnetMC3_18 --model_pathology TransMIL \
    --model_CI CLIP --CI_input_version text --CI_prompt_version devided \
    --learnablePrompt 1 --n_ctx 8 \
    --aggregator TransMIL --loss_point CT-Pth-Last \
    --hospital_test "['EUMC','HUMC','SCHMC']" \
    --best_thres 0.4430 \
    --test_pth "$1" \
    "${@:2}"

# valid mode (Youden threshold selection from the validation ROC):
# python scripts/test.py --mode valid --test_pth <run_dir> ...
