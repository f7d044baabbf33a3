"""Multi-host entry point (satae.parallel.distributed): the
jax.distributed.initialize() call is strictly opt-in, idempotent, and
single-process behavior is unchanged when not requested (VERDICT-r3 #7)."""

import pytest

from satae.parallel import distributed


@pytest.fixture(autouse=True)
def reset_state(monkeypatch):
    monkeypatch.setattr(distributed, "_initialized", False)
    monkeypatch.delenv("SATAE_MULTIHOST", raising=False)


@pytest.fixture
def spy_initialize(monkeypatch):
    calls = []

    class FakeDistributed:
        @staticmethod
        def initialize():
            calls.append(1)

    import jax

    monkeypatch.setattr(jax, "distributed", FakeDistributed)
    return calls


pytestmark = pytest.mark.quick


def test_single_process_default_untouched(spy_initialize):
    """No flag, no env var: initialize is never called and the process stays
    single-host."""
    assert distributed.maybe_initialize() is False
    assert distributed.maybe_initialize(False) is False
    assert spy_initialize == []


def test_flag_initializes_once(spy_initialize):
    assert distributed.maybe_initialize(True) is True
    assert distributed.maybe_initialize(True) is True  # idempotent
    assert distributed.maybe_initialize() is True  # already-up wins
    assert spy_initialize == [1]


def test_env_var_requests(monkeypatch, spy_initialize):
    monkeypatch.setenv("SATAE_MULTIHOST", "1")
    assert distributed.multihost_requested() is True
    assert distributed.maybe_initialize() is True
    assert spy_initialize == [1]


def test_env_var_falsy_values(monkeypatch):
    for v in ("0", "false", "no", ""):
        monkeypatch.setenv("SATAE_MULTIHOST", v)
        assert distributed.multihost_requested() is False


def test_initialize_failure_propagates(monkeypatch):
    """A half-wired multi-host run fails loudly instead of degrading to a
    1/N-data single-process run."""
    import jax

    class Broken:
        @staticmethod
        def initialize():
            raise RuntimeError("no coordinator")

    monkeypatch.setattr(jax, "distributed", Broken)
    with pytest.raises(RuntimeError, match="no coordinator"):
        distributed.maybe_initialize(True)
    assert distributed._initialized is False


def test_process_info_single_process():
    info = distributed.process_info()
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert info["local_device_count"] == info["global_device_count"]
    assert distributed.is_primary() is True


def test_cli_flag_and_config_plumbing(spy_initialize):
    """--multihost lands in RuntimeConfig and fit() routes through the
    gate; without the flag the config default stays off."""
    from satae.cli import build_parser
    from satae.config import RuntimeConfig

    assert RuntimeConfig().multihost is False
    args = build_parser().parse_args(["fit", "--multihost", "--out", "/tmp/x"])
    assert args.multihost is True
    args2 = build_parser().parse_args(["fit", "--out", "/tmp/x"])
    assert args2.multihost is False
