"""Child process for the multi-host DP test (not a pytest module).

Each of N processes owns 2 virtual CPU devices, joins the jax.distributed
cluster, builds the global mesh, assembles its LOCAL shard of a globally
deterministic batch via make_array_from_process_local_data, runs ONE DP
train step, and prints the (globally pmean'd) loss.
"""
import os
import sys

coordinator, num_procs, proc_id = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=num_procs, process_id=proc_id)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_train import small_ssd_cfg, get_batch  # noqa: E402
from x_detector_tpu.parallel import mesh as mesh_lib  # noqa: E402
from x_detector_tpu.parallel.data_parallel import make_dp_train_step  # noqa: E402
from x_detector_tpu.train.trainer import create_model_and_state  # noqa: E402

import dataclasses  # noqa: E402

n_total = num_procs * 2
cfg = small_ssd_cfg()
cfg = dataclasses.replace(
    cfg, train=dataclasses.replace(cfg.train, batch_size=n_total))
model, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                      dtype=jnp.float32)
mesh = mesh_lib.make_mesh(n_total)
step = make_dp_train_step(model, cfg, mesh)

global_batch = get_batch(cfg)  # same on every process (seeded)
# local shard: this process's slice of the global batch
lo, hi = proc_id * 2, (proc_id + 1) * 2
local = {k: np.asarray(v[lo:hi]) for k, v in global_batch.items()}
batch = mesh_lib.shard_batch(mesh, local)
state = mesh_lib.replicate_state(mesh, state)
state, metrics = step(state, batch, jax.random.PRNGKey(1))
loss = float(np.asarray(jax.device_get(metrics["total_loss"])))
print(f"MULTIHOST_LOSS {proc_id} {loss:.8f}", flush=True)
jax.distributed.shutdown()
