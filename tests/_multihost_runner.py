"""Two-process multi-host smoke — executed as a subprocess pair by
tests/test_multihost.py.

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
rendezvous over a local TCP coordinator gives an 8-device global mesh
across 2 "hosts" — the closest CPU-only analogue of a 2-host TPU pod
slice.  Exercises the full multi-host wiring end-to-end (VERDICT r2 #7):

- ``initialize_distributed`` (ref dist.init_process_group,
  BaseManager.py:132-134)
- per-host loader index shards (disjoint + complete across processes)
- global-batch assembly from process-local data + 2 sharded train steps
  of the real model/loss/optimizer stack (loss identical on both hosts)
- ``barrier`` / ``all_reduce_numpy`` / ``mesh_reduce_mean`` helpers
  (ref utils/distributed.py:5-60)
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

proc_id, num_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4"
    " --xla_backend_optimization_level=0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from mscs_tpu.parallel import initialize_distributed
    initialize_distributed(f"127.0.0.1:{port}", num_procs, proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * num_procs

    from mscs_tpu.parallel import make_mesh, replicate, shard_batch
    from mscs_tpu.parallel.dist import (all_reduce_numpy, barrier,
                                        mesh_reduce_mean)

    # --- per-host loader shards: disjoint and complete ---------------------
    from jax.experimental import multihost_utils

    from mscs_tpu.data.loader import DataLoader

    class _Toy:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return (np.full((4, 4, 3), i, np.float32),
                    np.full((4, 4), i, np.int32), {"index": i})

    ld = DataLoader(_Toy(), 2, shuffle=True, num_workers=1, seed=3,
                    process_index=jax.process_index(),
                    process_count=jax.process_count())
    ld.set_epoch(0)
    seen = sorted(int(v) for b in ld for v in np.asarray(b["label"])[:, 0, 0])
    assert len(seen) == 8, seen
    gathered = multihost_utils.process_allgather(np.asarray(seen))
    all_seen = sorted(int(v) for v in np.asarray(gathered).ravel())
    assert all_seen == list(range(16)), all_seen  # disjoint + complete

    # --- 2 sharded train steps of the real stack ---------------------------
    from __graft_entry__ import _build_train_setup

    graph = {"model": "DeepLabv3", "dataset": "CITYSCAPES",
             "backbone": "resnet18", "out_stride": 32,
             "align_corners": True,
             "ms_projector": {"mlp": [[1, -1, 1]], "d": 16, "use_bn": True,
                              "feats": ["layer1", "layer4"]}}
    loss = {"dataset": "CITYSCAPES", "experiment": 1, "temperature": 0.1,
            "cross_scale_contrast": True, "weights": [1.0, 0.4], "scales": 2,
            "losses": {"CrossEntropyLoss": 1,
                       "DenseContrastiveLossV2_ms": 0.1},
            "max_features_total": 256}
    # each process builds its LOCAL half of the global batch (4 of 8)
    state, step, local_batch = _build_train_setup(graph, loss, batch=4, hw=48)
    mesh = make_mesh()
    assert mesh.devices.size == 4 * num_procs
    state = replicate(mesh, state)
    batch = shard_batch(mesh, local_batch)
    assert batch["image"].shape[0] == 4 * num_procs  # global batch

    step_jit = jax.jit(step, donate_argnums=(0,))
    rng = jax.random.key(0)
    losses = []
    for i in range(2):
        state, logs = step_jit(state, batch, rng, 0)
        losses.append(float(jax.device_get(logs["loss"])))
    assert all(np.isfinite(l) for l in losses), losses
    assert int(jax.device_get(state.step)) == 2

    # loss identical across hosts (replicated output of the global program)
    both = multihost_utils.process_allgather(np.asarray(losses))
    np.testing.assert_allclose(np.asarray(both)[0], np.asarray(both)[-1],
                               rtol=0, atol=0)

    # --- dist helpers -------------------------------------------------------
    barrier()
    total = all_reduce_numpy(np.array([proc_id + 1.0]))
    assert float(total[0]) == sum(range(1, num_procs + 1)), total
    x = np.arange(8 * num_procs, dtype=np.float32).reshape(-1, 2)
    m = mesh_reduce_mean(mesh, shard_batch(mesh, x))
    np.testing.assert_allclose(np.asarray(jax.device_get(m)),
                               x.mean(axis=0), rtol=1e-6)

    print(f"MULTIHOST OK proc={proc_id} loss={losses[-1]:.4f}")


if __name__ == "__main__":
    main()
