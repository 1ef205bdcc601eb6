"""Config selection: heuristic invariants + the persistent measured-autotune
cache (the reference's occupancy heuristic re-runs per call,
`cutlass_heuristic.cc:123-206`; ours is cached per shape and per chip)."""

import json
import os

import pytest

from eetq_tpu.kernels.autotune import (
    MAX_DECODE_M,
    MatmulConfig,
    VMEM_BUDGET_BYTES,
    _candidate_configs,
    _load_persistent,
    _save_persistent,
    _tune_key,
    choose_config,
)


@pytest.fixture(autouse=True)
def _isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("EETQ_AUTOTUNE_CACHE", str(tmp_path / "tune.json"))
    _load_persistent.cache_clear()
    choose_config.cache_clear()
    yield
    _load_persistent.cache_clear()
    choose_config.cache_clear()


def test_decode_config_whole_bands():
    c = choose_config(1, 4096, 11264)
    assert c.bm == 8
    assert 4096 % c.bk == 0
    assert c.vmem_bytes() <= VMEM_BUDGET_BYTES


def test_prefill_config_divides():
    c = choose_config(1024, 4096, 11264)
    assert 4096 % c.bk == 0 and 11264 % c.bn == 0
    assert c.vmem_bytes() <= VMEM_BUDGET_BYTES


def test_persistent_cache_overrides_heuristic():
    heur = choose_config(1, 4096, 11264)
    _save_persistent({_tune_key(1, 4096, 11264, 8): [8, 128, 1024]})
    choose_config.cache_clear()
    got = choose_config(1, 4096, 11264)
    assert got == MatmulConfig(8, 128, 1024)
    assert got != heur
    # other shapes unaffected
    assert choose_config(1024, 4096, 11264).bm != 8


def test_persistent_cache_file_roundtrip():
    _save_persistent({"k": [1, 2, 3]})
    path = os.environ["EETQ_AUTOTUNE_CACHE"]
    with open(path) as f:
        assert json.load(f) == {"k": [1, 2, 3]}
    _load_persistent.cache_clear()
    assert _load_persistent() == {"k": [1, 2, 3]}


def test_candidates_all_valid():
    for m, kp, np_ in [(1, 4096, 11264), (8, 11008, 4096), (512, 4096, 4096)]:
        cands = _candidate_configs(m, kp, np_)
        assert cands
        for c in cands:
            assert kp % c.bk == 0
            assert np_ % c.bn == 0
            assert c.vmem_bytes() <= VMEM_BUDGET_BYTES
            if m <= MAX_DECODE_M:
                assert c.bm == 8


def test_decode_bucket_shares_config():
    assert choose_config(1, 4096, 11264) == choose_config(8, 4096, 11264)
