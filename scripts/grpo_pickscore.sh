#!/bin/bash
# Adversarial-PickScore GRPO training (reference scripts/grpo_pickscore.sh
# equivalent). Multi-host: set JAX_COORDINATOR_ADDRESS/JAX_PROCESS_COUNT per
# host; the mesh spans all chips automatically.
python -m adv_grpo_tpu.cli.train --config pickscore_cotrain_sd3_fast "$@"
