"""The shared benchmark measurement protocol (climate_sim_tpu/benchproto.py)
used by bench.py and the perf scripts — config literal, AOT helper, and the
best-of-N timing dance."""

import jax
import jax.numpy as jnp

from climate_sim_tpu.benchproto import (
    aot_compile,
    bench_config,
    sync_fetch,
    time_best_of,
)
from climate_sim_tpu.config import BCType


def test_bench_config_is_canonical_workload():
    cfg = bench_config(256, 128, 10)
    assert (cfg.nx, cfg.ny) == (256, 128)
    assert (cfg.steps, cfg.out_every) == (10, 10)
    assert (cfg.D, cfg.vx, cfg.vy) == (0.05, 0.5, -0.25)
    # all three BC kinds exercised
    assert set(cfg.bc.as_tuple()) == {
        BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC
    }
    cfg.validate()


def test_aot_compile_and_time_best_of():
    u0 = jnp.ones((8, 8), jnp.float32)
    fn = aot_compile(jax.jit(lambda u: u * 2.0), u0)
    best, out = time_best_of(fn, u0, reps=3, trials=2)
    assert best > 0.0
    # warm-up (1) + 2 trials x 3 reps = 7 doublings
    assert float(out[0, 0]) == 2.0 ** 7
    sync_fetch(out)  # idempotent on a ready array


def test_aot_compile_falls_back_without_lower():
    def plain(u):
        return u + 1.0  # no .lower attribute -> fallback path

    fn = aot_compile(plain, jnp.zeros((2, 2)))
    assert fn is plain
