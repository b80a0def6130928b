"""Worker process for the REAL 2-process multi-host test (VERDICT r2 #5).

Run as a plain script (not under pytest) by tests/test_multihost.py, twice in
parallel with a shared coordinator. Exercises every ``process_count > 1``
branch un-mocked: jax.distributed.initialize over localhost,
make_array_from_process_local_data (put_batch), gather_global /
process_allgather, the trainer's sharded epoch, the save-dir broadcast, and
the eval CLI's per-process shard + merge.
"""

import argparse
import json
import os
import sys
import traceback


def run(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from adv_grpo_tpu.cli.train import maybe_init_distributed

    maybe_init_distributed()
    assert jax.process_count() == args.nprocs, jax.process_count()
    assert jax.process_index() == args.pid
    assert jax.device_count() == 2 * args.nprocs, jax.devices()
    assert all(d.platform == "cpu" for d in jax.devices())

    import numpy as np

    from adv_grpo_tpu.parallel.mesh import (
        gather_global, make_mesh, process_allgather, put_batch, to_local_np)

    result = {"pid": args.pid}

    # ── collective helpers: the real multihost_utils paths ──────────────
    x = (np.arange(4) + args.pid * 100).astype(np.float32)
    g, sl = gather_global(x)
    want = np.concatenate(
        [np.arange(4) + p * 100 for p in range(args.nprocs)]).astype(np.float32)
    assert g.shape == (4 * args.nprocs,), g.shape
    assert np.array_equal(g, want), g
    assert np.array_equal(g[sl], x)
    try:
        gather_global(np.asarray(["a", "b"]))
        raise AssertionError("gather_global accepted strings")
    except TypeError:
        pass
    tree = process_allgather({"r": np.full((2,), args.pid, np.float32)})
    assert np.asarray(tree["r"]).reshape(-1).tolist() == [0.0, 0.0, 1.0, 1.0]
    result["collectives"] = True

    # ── put_batch: make_array_from_process_local_data + local round-trip ──
    mesh = make_mesh()
    local = np.stack([np.full(3, args.pid * 10 + i, np.float32)
                      for i in range(4)])
    arr = put_batch(local, mesh)
    assert arr.shape == (4 * args.nprocs, 3), arr.shape
    assert len({s.device for s in arr.addressable_shards}) == 2  # local span
    assert np.array_equal(to_local_np(arr), local)
    result["put_batch"] = True

    # ── one full smoke trainer epoch through the real CLI (also runs the
    #    save-dir timestamp broadcast: save_dir='') ───────────────────────
    from adv_grpo_tpu.cli import train as train_cli

    logdir = os.path.join(args.workdir, "logs")
    train_cli.main([
        "--config", "smoke_sd3_fast", "--max_epochs", "1",
        "--set", "save_dir=", "--set", f"logdir={logdir}",
        "--set", "run_name=mh", "--set", "eval_freq=1000",
    ])
    result["train_runs"] = sorted(os.listdir(logdir))

    # ── distributed eval CLI: per-process shard, mesh span, merge ────────
    from adv_grpo_tpu.cli import eval as eval_cli

    out_dir = os.path.join(args.workdir, "eval")
    s = eval_cli.main([
        "--config", "smoke_sd3_fast", "--out_dir", out_dir,
        "--limit", "6", "--batch", "2", "--rewards",
    ])
    result["eval_n_saved"] = s["n_saved"]
    result["eval_counts"] = s["reward_counts"]

    # ── empty-shard eval: 1 prompt over 2 processes, rank 1's shard is
    #    empty. The rank must still execute the per-reward-key collectives
    #    (scoring its all-padding batch with valid=0) or the other rank
    #    hangs forever in process_allgather ────────────────────────────────
    s1 = eval_cli.main([
        "--config", "smoke_sd3_fast", "--out_dir",
        os.path.join(args.workdir, "eval_empty"),
        "--limit", "1", "--batch", "2", "--rewards",
    ])
    result["eval_empty_n_saved"] = s1["n_saved"]
    result["eval_empty_counts"] = s1["reward_counts"]
    result["ok"] = True
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--workdir", required=True)
    args = ap.parse_args()

    # BEFORE any jax import in this process
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{args.port}"
    os.environ["JAX_NUM_PROCESSES"] = str(args.nprocs)
    os.environ["JAX_PROCESS_ID"] = str(args.pid)

    try:
        result = run(args)
    except BaseException:
        result = {"pid": args.pid, "ok": False,
                  "error": traceback.format_exc()}
    with open(args.out, "w") as f:
        json.dump(result, f)
    sys.exit(0 if result.get("ok") else 1)


if __name__ == "__main__":
    main()
