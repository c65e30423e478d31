"""Test environment: force an 8-virtual-device CPU mesh before JAX initializes.

Multi-chip sharding tests run on jax's CPU multi-device simulation (SURVEY.md §4:
the reference has no distributed-testing precedent; we test the pjit/shard_map
layer on virtual devices). The bit-exact float64 parity paths are CPU anyway.
"""

import os

# smaller search-plane chunks: the CPU mesh compiles the search while_loop
# far faster at 128 lanes (results are chunk-size independent; the TPU smoke
# target exercises the production sizes)
os.environ.setdefault("MP3STEGO_TPU_SEARCH_CHUNK", "128")
os.environ.setdefault("MP3STEGO_TPU_BATCH_BUCKET_G", "64")
# deterministic engine selections in CI: no hardware probing — the static
# calibration defaults reproduce the tunneled-host behavior the selection
# tests pin (the probe itself is tested with synthetic Probe records)
os.environ.setdefault("MP3STEGO_TPU_PROBE", "0")
# selection tests pin the cost model, not link health — skip the bounded
# device-reachability check (it can cost its full timeout when the machine's
# device tunnel is down, and CI has no device either way)
os.environ.setdefault("MP3STEGO_TPU_DEVICE_USABLE", "1")

# jax may already be imported at interpreter start (TPU tunnel integration
# pre-imports it), so env vars alone are too late — set the config directly
# before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# MP3STEGO_TPU_TEST_TPU=1 keeps the real TPU backend (for tests/test_pallas.py
# and on-device smoke runs); default is the 8-virtual-device CPU mesh.
if os.environ.get("MP3STEGO_TPU_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(REPO, "tests", "golden")
REFERENCE_FIXTURE = "/root/reference/tests/test.mp3"


@pytest.fixture(scope="session")
def decode_golden():
    return np.load(os.path.join(GOLD, "decode_golden.npz"))


@pytest.fixture(scope="session")
def encode_golden():
    return np.load(os.path.join(GOLD, "encode_golden.npz"))


@pytest.fixture(scope="session")
def stego_golden():
    return np.load(os.path.join(GOLD, "stego_golden.npz"))


@pytest.fixture(scope="session")
def fixture_mp3(tmp_path_factory, encode_golden):
    """A 320kbps stereo MP3 test fixture.

    Uses the reference's fixture when mounted; otherwise synthesizes an
    equivalent one from the committed golden (the reference-identical clear
    re-encode), keeping the suite standalone.
    """
    if os.path.exists(REFERENCE_FIXTURE):
        return REFERENCE_FIXTURE
    p = tmp_path_factory.mktemp("fixture") / "test.mp3"
    p.write_bytes(encode_golden["mp3_bytes"].tobytes())
    return str(p)


@pytest.fixture(scope="session")
def original_fixture_mp3():
    """The reference's original fixture; golden stage tensors correspond to it."""
    if not os.path.exists(REFERENCE_FIXTURE):
        pytest.skip("reference fixture not mounted")
    return REFERENCE_FIXTURE
