"""Worker process for the 2-process multi-host training test
(test_multiprocess.py). Each process owns 2 of 4 virtual CPU devices; the
loader materializes only this process's rows of every global batch
(parallel.mesh.local_batch_rows) and batch_to_device assembles the global
array via jax.make_array_from_process_local_data — the real multi-host data
path (SURVEY §2.4), not a whole-array device_put.

argv: process_id coordinator_port data_dir out_json
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    pid, port, data_dir, out_json = (int(sys.argv[1]), sys.argv[2],
                                     sys.argv[3], sys.argv[4])
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and len(jax.devices()) == 4

    import numpy as np

    from desire_tpu.data.loader import SDDLoader
    from desire_tpu.models.desire import init_desire
    from desire_tpu.parallel import mesh as mesh_mod
    from desire_tpu.train import trainer
    from desire_tpu.train.checkpoint import _replicated_to_host
    from desire_tpu.train.state import create_train_state
    from tests.test_multiprocess import mp_cfg

    cfg = mp_cfg(data_dir)
    loader = SDDLoader(cfg)
    mesh = mesh_mod.make_mesh(4, 1)
    params = init_desire(jax.random.PRNGKey(0), cfg)
    state = create_train_state(cfg, params, loader.num_batches)
    step_fn = trainer.make_train_step(cfg, loader.num_batches, mesh=mesh)

    losses = []
    state, _ = trainer.run_epoch(
        state, loader, 0, step_fn, mesh=mesh, max_batches=3, log_every=1,
        log_fn=lambda m, s: losses.append(m["loss"]))

    fingerprint = float(sum(
        np.abs(np.asarray(_replicated_to_host(l), np.float64)).sum()
        for l in jax.tree_util.tree_leaves(state.params)))
    with open(out_json, "w") as f:
        json.dump({"pid": pid, "losses": losses,
                   "fingerprint": fingerprint}, f)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
