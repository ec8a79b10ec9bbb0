"""Aux subsystem units: profiling trace, metrics, faults."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenix_tpu.utils import faults, metrics, profiling


def test_profiling_trace_writes_dump(tmp_path):
    with profiling.trace(str(tmp_path)):
        with profiling.annotate("unit-op"):
            np.asarray(jax.jit(lambda x: x * 2)(jnp.ones(16)))
    dumped = [
        os.path.join(dp, f) for dp, _, fs in os.walk(tmp_path) for f in fs
    ]
    assert dumped, "profiler produced no trace files"


def test_profiling_trace_noop_without_dir(monkeypatch):
    monkeypatch.delenv(profiling.TRACE_DIR_ENV, raising=False)
    with profiling.trace(None):
        pass  # must not raise or start a trace


def test_metrics_counters_and_timing():
    m = metrics.Metrics()
    with m.timed("op", detail=1) as record:
        record["extra"] = "x"
    snap = m.snapshot()
    assert snap["op.count"] == 1
    assert snap["op.seconds"] >= 0


def test_faults_fire_exactly_once():
    plan = faults.FaultPlan()
    plan.configure("search:2")
    plan.check("search")  # call 1: no fault
    with pytest.raises(faults.InjectedFault):
        plan.check("search")  # call 2: fires
    plan.check("search")  # call 3: disarmed
    plan.check("other")  # unarmed point never fires
