"""Worker process for the 2-process ``jax.distributed`` CPU test.

Launched by tests/test_multiprocess.py, one subprocess per rank.  Exercises
the REAL multi-process paths that the single-process 8-device dryrun cannot
(VERDICT r3 next-round #8):

  * ``jax.distributed.initialize`` rendezvous (the `--multihost` path of the
    train drivers, parallel/mesh.py::init_distributed's underlying call);
  * per-host input sharding via ``SEVIRDataLoader(num_shard, rank)`` —
    reference manual-shard arithmetic (sevir_dataloader.py:329-358): every
    event is read by exactly one process;
  * ``ForecastEvalSuite.cross_process_reduce`` (process_allgather + additive
    state sum) == the single-process global computation, exactly the
    torchmetrics ``sync_dist=True`` contract.

Each rank checks the reduced metrics against its own locally-computed global
values and prints ``MPTEST_PASS rank=<r>`` on success.
"""
import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def deterministic_pred(target):
    """A deterministic fake 1-member ensemble forecast for metric updates."""
    import numpy as np

    pred = np.clip(target + 0.1 * np.cos(37.0 * target), 0.0, 1.0)
    return pred[None]  # (M=1, B, T, H, W, C)


def collect_suite(data_root, num_shard, rank):
    from prediff_tpu.datasets.sevir import SEVIRDataLoader
    from prediff_tpu.evaluation.suite import ForecastEvalSuite

    dl = SEVIRDataLoader(
        data_types=["vil"], seq_len=13, raw_seq_len=25, stride=6,
        layout="NTHWC", batch_size=1, shuffle=False,  # batch 1: no ragged-
        # tail drop, so shards cover exactly the global window set
        sevir_catalog=os.path.join(data_root, "CATALOG.csv"),
        sevir_data_dir=os.path.join(data_root, "data"),
        num_shard=num_shard, rank=rank, split_mode="uneven",
    )
    suite = ForecastEvalSuite(threshold_list=(16, 74), metrics_list=("csi", "pod"))
    n_batches = 0
    import jax.numpy as jnp

    for batch in dl:
        vil = batch["vil"]  # (B, 13, H, W, 1)
        target = vil[:, 7:]
        suite.update(jnp.asarray(deterministic_pred(target)), jnp.asarray(target))
        n_batches += 1
    dl.close()
    return suite, n_batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--data", required=True)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.rank,
    )
    assert jax.process_count() == args.num_processes, jax.process_count()

    import numpy as np

    # every event lands in exactly one shard: allgather per-shard event ranges
    from jax.experimental import multihost_utils

    local, n_batches = collect_suite(args.data, args.num_processes, args.rank)
    spans = multihost_utils.process_allgather(
        np.asarray([n_batches], np.int64)
    )
    total_batches = int(np.asarray(spans).sum())

    reduced = local.cross_process_reduce()
    got = reduced.compute("test")

    # the global reference: one loader over ALL events, computed locally
    global_suite, global_batches = collect_suite(args.data, 1, 0)
    want = global_suite.compute("test")

    assert total_batches == global_batches, (total_batches, global_batches)
    for key, v in want.items():
        g = got[key]
        assert abs(g - v) < 1e-6, (key, g, v)
    print(f"MPTEST_PASS rank={args.rank} batches={n_batches} "
          f"total={total_batches} keys={len(want)}", flush=True)


if __name__ == "__main__":
    main()
