"""Worker for the real 2-process jax.distributed test (launched by
tests/test_multiprocess.py). Each process gets 2 virtual CPU devices;
jax.distributed runs the cross-process collectives over localhost gRPC.

Exercises the actual multi-host code paths of the framework:
initialize_distributed (explicit coordinator env), disjoint eval
sharding (shard_indices pad=False), and the run_validation-style
cross-process metric merge (allsum_across_processes).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PROC_ID = int(sys.argv[1])
COORD = sys.argv[2]


def main():
    os.environ["COORDINATOR_ADDRESS"] = COORD
    from cavp_tpu.parallel import (allsum_across_processes, barrier,
                                   create_mesh, initialize_distributed,
                                   is_primary, shard_batch)
    from cavp_tpu.data.pipeline import shard_indices

    initialize_distributed(coordinator_address=COORD, num_processes=2,
                           process_id=PROC_ID)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == PROC_ID
    assert len(jax.devices()) == 4, len(jax.devices())  # 2 local x 2 procs
    assert is_primary() == (PROC_ID == 0)

    # disjoint eval shards with no duplication
    mine = shard_indices(10, PROC_ID, 2, shuffle=False, seed=0, pad=False)
    assert mine == list(range(PROC_ID, 10, 2)), mine

    # cross-process global-batch computation: a jitted sum over a
    # process-sharded batch must see all 4 shards
    mesh = create_mesh()
    local = np.full((2, 4), PROC_ID + 1.0, np.float32)  # 2 local rows
    batch = shard_batch({"x": local}, mesh)

    @jax.jit
    def global_sum(b):
        return jnp.sum(b["x"])

    total = float(global_sum(batch))
    # rows: proc0 contributes 2 rows of 1s, proc1 2 rows of 2s
    assert abs(total - (2 * 4 * 1.0 + 2 * 4 * 2.0)) < 1e-5, total

    # multi-slice x multi-host: the (dcn, ici) hybrid mesh spanning both
    # processes (device order puts each process's devices contiguous, so
    # the dcn axis IS the process boundary — the real pod layout).
    # shard_batch must assemble the global array from process-local
    # shards through make_array_from_process_local_data on the 2-D mesh.
    from cavp_tpu.parallel import create_hybrid_mesh

    hmesh = create_hybrid_mesh(num_slices=2)
    assert hmesh.devices.shape == (2, 2)
    assert not jax.sharding.NamedSharding(
        hmesh, jax.sharding.PartitionSpec()).is_fully_addressable
    hbatch = shard_batch({"x": local}, hmesh)
    htotal = float(global_sum(hbatch))
    assert abs(htotal - total) < 1e-5, (htotal, total)

    # run_validation-style metric merge: per-process partial sums
    partial = {"inter": np.asarray([PROC_ID + 1.0, 2.0]),
               "union": np.asarray([4.0, PROC_ID * 10.0])}
    merged = allsum_across_processes(partial)
    assert abs(merged["inter"][0] - 3.0) < 1e-6, merged
    assert abs(merged["union"][1] - 10.0) < 1e-6, merged

    # UNEVEN eval shards: run_validation's multi-host design — each
    # process evaluates its own shard count on its LOCAL mesh (no
    # cross-process lockstep; a global-mesh eval would deadlock the
    # moment shard sizes differ), then one merge at the end.
    from cavp_tpu.parallel import local_mesh, localize_replicated

    lm = local_mesh()
    assert all(d.process_index == PROC_ID for d in lm.devices.flat)
    weights = localize_replicated({"w": jnp.full((4,), 2.0)})

    @jax.jit
    def local_eval(w, b):
        return jnp.sum(w["w"] * b)

    n_batches = 3 if PROC_ID == 0 else 1  # deliberately unequal
    acc = 0.0
    for i in range(n_batches):
        from cavp_tpu.parallel import shard_batch as sb
        b = sb({"x": np.full((2, 4), float(i + 1), np.float32)}, lm)
        acc += float(local_eval(weights, b["x"]))
    total = allsum_across_processes({"acc": np.asarray(acc)})
    # proc0: (1+2+3)*2rows*4cols*2.0 = 96 ; proc1: 1*2*4*2 = 16
    assert abs(float(total["acc"]) - 112.0) < 1e-5, total

    # the real runner.run_validation under 2 processes with UNEVEN
    # shards: proc0 gets 2 batches, proc1 gets 1 — must not deadlock,
    # and the merged metrics must equal both processes' view
    from cavp_tpu.config import get_config
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model, run_validation
    from cavp_tpu.engine.state import create_train_state

    cfg = get_config("avss").replace(
        num_classes=4, image_width=32, image_height=32, visual_backbone=18,
        compute_dtype="float32", gpus=2, batch_size=2)
    model = build_model(cfg)
    tx, _ = make_optimizer(cfg)
    sample = {"image": jnp.zeros((1, 32, 32, 3)),
              "audio": jnp.zeros((1, 96, 64, 1))}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample,
                               cfg)

    def batch(seed):
        r = np.random.RandomState(seed)
        return {
            "image": r.randn(2, 32, 32, 3).astype(np.float32),
            "waveform": np.zeros((2, 1, 16000), np.float32),
            "pix_label": r.randint(0, 4, (2, 32, 32)).astype(np.int32),
            "valid": np.ones((2,), np.float32),
        }

    loader = [batch(0), batch(1)] if PROC_ID == 0 else [batch(2)]
    results = run_validation(cfg, model, state, loader)
    assert np.isfinite(results["miou"]), results
    merged = allsum_across_processes({"m": np.asarray(results["miou"])})
    # identical on both processes after the internal merge
    assert abs(float(merged["m"]) - 2 * results["miou"]) < 1e-6

    # primary-only checkpoint save under process_count=2 must not
    # deadlock: orbax's default save() opens a barrier over ALL jax
    # processes; _checkpointer scopes it to the saving process
    import tempfile

    from cavp_tpu.engine.checkpoint import (restore_checkpoint,
                                            save_checkpoint)

    if is_primary():
        d = tempfile.mkdtemp()
        p = save_checkpoint(os.path.join(d, "best"), state)
        assert restore_checkpoint(p)["step"] == int(state.step)

    barrier()
    print(f"proc {PROC_ID}: OK", flush=True)


if __name__ == "__main__":
    main()
