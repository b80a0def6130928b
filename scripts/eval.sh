#!/bin/bash
# Batch eval / generation (reference scripts/eval.sh).
python -m adv_grpo_tpu.cli.eval --config eval_sd3_fast "$@"
