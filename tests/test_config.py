import os
import pytest
from datavec_ray.config import partitions_default, partitions_override

def test_default_without_env(monkeypatch):
    monkeypatch.delenv("DATAVEC_NUM_PARTITIONS", raising=False)
    assert partitions_default() == 32
    assert partitions_override(32) == 32
    assert partitions_override(64, library_default=64) == 64
    assert partitions_override(128) == 128      # explicit wins

def test_env_replaces_default(monkeypatch):
    monkeypatch.setenv("DATAVEC_NUM_PARTITIONS", "4096")
    assert partitions_default() == 4096
    assert partitions_override(32) == 4096      # library default replaced
    assert partitions_override(64, library_default=64) == 4096
    assert partitions_override(100) == 100      # explicit still wins

def test_env_validation(monkeypatch):
    monkeypatch.setenv("DATAVEC_NUM_PARTITIONS", "0")
    with pytest.raises(ValueError):
        partitions_default()
