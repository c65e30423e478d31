"""CI coverage for the driver entry points (``__graft_entry__.py``).

The multichip dryrun is the round's only driver-checked multi-chip artifact;
it rotted twice (round 1, round 3) because nothing in the suite imported it —
a prep-schema change in ``decode_plane`` broke the synthetic batch invisibly
until the driver ran. These tests execute the REAL entry points on the
8-virtual-device CPU mesh on every push, and pin the schema contract
(``_synthetic_prep`` is now derived from ``host_prepare`` by construction,
so drift is impossible; the test makes any regression loud anyway).
"""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_synthetic_prep_schema_matches_plane():
    """The synthetic batch must carry exactly the plane's input keys."""
    from mp3stego_tpu.ops import decode_plane as dp

    prep = graft._synthetic_prep(4)
    assert set(prep) == set(dp.ALL_KEYS)
    t = prep["raw_i8"].shape[1]
    assert t == 4
    assert prep["is_pos"].shape == (t, 4, 22) and prep["is_pos"].dtype == np.int8
    assert prep["is_mask"].shape == (t,) and prep["is_mask"].dtype == bool
    assert prep["is_tab"].shape == (t,) and prep["is_tab"].dtype == np.int8
    # the synthetic stream must exercise the non-trivial plane paths: at
    # least one short/reorder granule, one ISO-mixed granule, one MS granule,
    # one intensity granule, and at least one sparse |x|>127 escape
    assert prep["is_short_blk"].any()
    assert (prep["mode"] == 3).any()
    assert prep["ms_mask"].any()
    assert prep["is_mask"].any()
    assert prep["exc_t"].size > 0


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (2, 8, 576)
    assert np.isfinite(out).all()


def test_dryrun_multichip_8():
    """Execute the full driver dryrun on the 8-virtual-device mesh.

    This is the exact function the driver runs for MULTICHIP_r*.json; a
    prep-schema or sharding regression must turn CI red, not the round
    artifact. The in-process config updates fall through harmlessly when
    conftest already initialized the 8-device CPU backend.
    """
    graft.dryrun_multichip(8)
