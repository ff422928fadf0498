"""Worker process for the 2-process DCN test (spawned by test_multihost.py).

Each process plays one "host" of a multi-host deployment: it brings up
jax.distributed over a local coordinator, owns 2 of the 4 virtual CPU
devices, ingests its own half of the stations via
``multihost.host_channel_slice`` + ``make_global_input``, runs one
channel-sharded receiver step on the global mesh, and checks its local
output shards against a process-local serial reference.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from rtsdr_tpu.config import MODE0
    from rtsdr_tpu.parallel import multihost
    from rtsdr_tpu.parallel.channels import make_channel_sharded_receiver
    from rtsdr_tpu.parallel.mesh import make_mesh
    from rtsdr_tpu.pipeline.receiver import make_receiver

    multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()
    assert len(jax.local_devices()) == 2

    n_channels = 4
    cfg = MODE0
    # all processes know the full station set deterministically; each host
    # only READS its own rows (as it would from its own SDR front ends)
    rng = np.random.default_rng(0xD07)
    full = rng.integers(0, 256, (n_channels, cfg.block_size), dtype=np.uint8)

    mesh = make_mesh(2 * nproc, 1)
    sl = multihost.host_channel_slice(n_channels)
    assert sl == slice(pid * 2, pid * 2 + 2), sl
    local = full[sl]

    garr = multihost.make_global_input(mesh, n_channels, cfg.block_size, local)
    assert garr.shape == (n_channels, cfg.block_size)
    # ingest never crossed DCN: this host holds exactly its own rows
    for shard in garr.addressable_shards:
        rows = shard.index[0]
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      full[rows])

    init_fn, step_fn, _ = make_channel_sharded_receiver(
        cfg, mesh, n_channels, jnp.float32,
        enable_rds=False, enable_stereo=False)
    state = init_fn()
    state, out = step_fn(state, garr)

    # serial reference, computed process-locally (no sharding)
    ser_init, ser_step = make_receiver(cfg, (n_channels,), jnp.float32,
                                       enable_rds=False, enable_stereo=False)
    _, ref = jax.jit(ser_step)(ser_init(), jnp.asarray(full))
    ref_mono = np.asarray(ref.mono)

    for shard in out.mono.addressable_shards:
        rows = shard.index[0]
        np.testing.assert_array_equal(np.asarray(shard.data), ref_mono[rows])

    print(f"OK process {pid}: {len(out.mono.addressable_shards)} local "
          f"shards match serial", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
