"""Tests for registry, events, logger and comm utilities."""

import json
import os
import tempfile

import pytest

from fsgd_tpu.utils import Registry, seed_all_rng, collect_env_info
from fsgd_tpu.utils.events import EventStorage, JSONWriter, get_event_storage, has_event_storage
from fsgd_tpu.utils import comm


def test_registry():
    REG = Registry("TEST")

    @REG.register()
    class Thing:
        pass

    assert REG.get("Thing") is Thing
    assert "Thing" in REG
    with pytest.raises(KeyError):
        REG.get("Missing")
    with pytest.raises(KeyError):
        REG.register(Thing)  # duplicate


def test_event_storage_scalars():
    with EventStorage(start_iter=0) as storage:
        assert has_event_storage()
        assert get_event_storage() is storage
        for i in range(10):
            storage.put_scalar("loss", float(i), smoothing_hint=True)
            storage.put_scalar("lr", 0.1, smoothing_hint=False)
            storage.step()
        assert storage.history("loss").latest() == 9.0
        assert storage.history("loss").median(20) == 4.5
        latest = storage.latest_with_smoothing_hint(window_size=20)
        assert latest["lr"][0] == 0.1
    assert not has_event_storage()


def test_event_storage_name_scope():
    with EventStorage() as storage:
        with storage.name_scope("gambler"):
            storage.put_scalar("loss", 1.0)
        assert "gambler/loss" in storage.histories()


def test_json_writer():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "metrics.json")
        with EventStorage() as storage:
            writer = JSONWriter(path)
            storage.put_scalar("loss", 1.5)
            writer.write()
            storage.step()
            storage.put_scalar("loss", 2.5)
            writer.write()
            writer.close()
        lines = [json.loads(l) for l in open(path)]
        assert len(lines) == 2
        assert lines[0]["iteration"] == 0


def test_comm_single_process():
    assert comm.get_world_size() >= 1
    assert comm.is_main_process() or comm.get_rank() > 0
    assert comm.all_gather({"a": 1}) == [{"a": 1}] or comm.get_world_size() > 1
    d = {"x": 1.0, "y": 2.0}
    assert comm.reduce_dict(d) == d or comm.get_world_size() > 1


def test_seed_all_rng():
    s = seed_all_rng(42)
    assert s == 42
    s2 = seed_all_rng(-1)
    assert s2 >= 0


def test_collect_env_info():
    info = collect_env_info()
    assert "jax" in info
