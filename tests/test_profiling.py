import time

import jax.numpy as jnp
import numpy as np

from threepu.utils.profiling import Stopwatch, ThroughputMeter, force_sync


class TestStopwatch:
    def test_stages_and_report(self):
        sw = Stopwatch()
        with sw.stage("a") as h:
            h["result"] = jnp.ones((4, 4)) * 2
        with sw.stage("a"):
            time.sleep(0.01)
        with sw.stage("b"):
            pass
        s = sw.summary()
        assert set(s) == {"a", "b"}
        assert s["a"] > 0
        assert "a=" in sw.report() and "b=" in sw.report()


class TestThroughputMeter:
    def test_accumulates(self):
        m = ThroughputMeter()
        m.add(100, 2.0)
        m.add(300, 2.0)
        assert m.points_per_sec == 100.0

    def test_zero_safe(self):
        assert ThroughputMeter().points_per_sec == 0.0


def test_force_sync():
    force_sync({"x": jnp.arange(5.0)})
