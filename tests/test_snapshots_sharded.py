"""In-process coverage of ShardedSnapshotWriter on the virtual 8-device CPU
mesh: a single process owns every shard, so the per-shard region-write path
(the analogue of the reference's collective hyperslab writes,
io.cpp:402-424) runs without subprocess coordination.

Byte-parity oracle: SnapshotWriter writing the assembled global field must
produce an identical file.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climate_sim_tpu.config import SimConfig
from climate_sim_tpu.io.netcdf import NetCDFFile
from climate_sim_tpu.io.snapshots import ShardedSnapshotWriter, SnapshotWriter
from climate_sim_tpu.parallel.mesh import field_sharding, make_mesh


@pytest.fixture
def cfg():
    return SimConfig(nx=64, ny=32, D=0.05, vx=0.3, vy=-0.2, dt=0.1,
                     steps=4, out_every=2)


def _frames(cfg, n=2, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((cfg.ny, cfg.nx)).astype(np.float32)
            for _ in range(n)]


@pytest.mark.parametrize("use_native", [False, True])
def test_sharded_writer_byte_parity(tmp_path, cfg, use_native):
    mesh = make_mesh(4, 2)
    frames = _frames(cfg)

    ref_path = str(tmp_path / "ref.nc")
    with SnapshotWriter(ref_path, cfg, use_native=False) as w:
        for f in frames:
            w.write(f)

    sh_path = str(tmp_path / "sharded.nc")
    w = ShardedSnapshotWriter(sh_path, cfg, create=True, use_native=use_native)
    assert w.time_index == 0
    for f in frames:
        us = jax.device_put(jnp.asarray(f), field_sharding(mesh))
        w.write_shards(us)
    assert w.time_index == len(frames)
    w.sync()
    w.close()

    with open(ref_path, "rb") as a, open(sh_path, "rb") as b:
        assert a.read() == b.read()


def test_sharded_writer_attach_mode(tmp_path, cfg):
    """create=True then attach (create=False) from the same process: the
    attach path byte-verifies the header and appends its regions."""
    mesh = make_mesh(4, 2)
    f0, f1 = _frames(cfg)
    path = str(tmp_path / "o.nc")

    creator = ShardedSnapshotWriter(path, cfg, create=True, use_native=False)
    us = jax.device_put(jnp.asarray(f0), field_sharding(mesh))
    creator.write_shards(us)
    creator.sync()

    attacher = ShardedSnapshotWriter(path, cfg, create=False, use_native=False)
    us1 = jax.device_put(jnp.asarray(f1), field_sharding(mesh))
    attacher.write_shards(us1, step_index=1)
    attacher.sync()
    attacher.close()
    creator.write_shards(us1, step_index=1)  # creator maintains numrecs
    creator.close()

    with NetCDFFile(path) as ds:
        got = np.asarray(ds.variables["u"][:, :, :])
    np.testing.assert_allclose(got[0], f0.astype(np.float64), rtol=0, atol=0)
    np.testing.assert_allclose(got[1], f1.astype(np.float64), rtol=0, atol=0)


def test_sharded_writer_replicated_rows_written_once(tmp_path, cfg):
    """A fully-replicated array writes each region exactly once (replica_id
    guard) and still round-trips."""
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = make_mesh(4, 2)
    (frame,) = _frames(cfg, n=1)
    path = str(tmp_path / "rep.nc")
    rep = jax.device_put(jnp.asarray(frame),
                         NamedSharding(mesh, PartitionSpec()))
    with ShardedSnapshotWriter(path, cfg, create=True, use_native=False) as w:
        w.write_shards(rep)
    with NetCDFFile(path) as ds:
        got = np.asarray(ds.variables["u"][0, :, :])
    np.testing.assert_allclose(got, frame.astype(np.float64), rtol=0, atol=0)


def test_context_manager_and_native_fallback(tmp_path, cfg, monkeypatch):
    """use_native=True falls back to the Python codec cleanly when the
    native runtime import fails."""
    import climate_sim_tpu.io.native as native_mod

    def boom(*a, **k):
        raise OSError("no native runtime in this test")

    monkeypatch.setattr(native_mod, "NativeSnapshotWriter", boom)
    path = str(tmp_path / "fb.nc")
    (frame,) = _frames(cfg, n=1)
    mesh = make_mesh(4, 2)
    with ShardedSnapshotWriter(path, cfg, create=True, use_native=True) as w:
        assert w._native is None  # fallback engaged
        us = jax.device_put(jnp.asarray(frame), field_sharding(mesh))
        w.write_shards(us)
    assert os.path.getsize(path) > 0
