#!/bin/bash
# DINO-patch adversarial GRPO training (reference scripts/grpo_dino.sh).
python -m adv_grpo_tpu.cli.train --config dino_cotrain_sd3_patch_fast "$@"
