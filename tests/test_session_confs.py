"""Engine-owned session confs (round 12, verdict r11 item 3): the AQE
minPartitionSize floor must live in the ENGINE (common/session.py) and be
inherited by every session-construction site — bench.py measuring a conf
the library never ships is a harness-only 'optimization'."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from source_flink_cdc_3_5_0_spark.common.session import (  # noqa: E402
    apply_engine_confs,
    engine_session_confs,
)


class _FakeBuilder:
    def __init__(self):
        self.confs = {}

    def config(self, k, v):
        self.confs[k] = v
        return self


def test_engine_confs_carry_the_aqe_floor():
    confs = engine_session_confs()
    assert confs["spark.sql.adaptive.enabled"] == "true"
    assert "spark.sql.adaptive.coalescePartitions.minPartitionSize" in confs


def test_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_AQE_MIN_PARTITION", "1m")
    assert engine_session_confs()[
        "spark.sql.adaptive.coalescePartitions.minPartitionSize"] == "1m"
    monkeypatch.delenv("SPARK_GRAFT_AQE_MIN_PARTITION")
    assert engine_session_confs()[
        "spark.sql.adaptive.coalescePartitions.minPartitionSize"] == "64k"


def test_apply_folds_every_conf():
    b = _FakeBuilder()
    assert apply_engine_confs(b) is b
    assert b.confs == engine_session_confs()


def test_every_session_builder_inherits_the_engine_confs():
    """Grep-level pin: each file that builds a measurement or engine
    session routes through apply_engine_confs, so the floor cannot drift
    back into being harness-only."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel in ("bench.py", "bench_retime.py", "bench_scale.py",
                os.path.join("source_flink_cdc_3_5_0_spark", "__main__.py")):
        with open(os.path.join(root, rel)) as f:
            src = f.read()
        assert "apply_engine_confs" in src, \
            f"{rel} builds a session without the engine confs"
        assert "coalescePartitions.minPartitionSize" not in src, \
            f"{rel} re-declares the AQE floor instead of inheriting it"
