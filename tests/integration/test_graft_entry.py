"""Driver contracts: __graft_entry__.entry() must stay jittable and
dryrun_multichip() must build + run the full sharded train/serve step.
These are executed by the round driver; a break here is a silent
end-of-round failure, so they are pinned in CI."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import __graft_entry__ as graft  # noqa: E402


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        fn, args = graft.entry()
        out = jax.jit(fn)(*args)
        out = np.asarray(out)
        assert out.ndim == 2 and out.shape[0] == 2
        assert np.all(np.isfinite(out))

    def test_dryrun_multichip_8(self):
        # conftest already forces cpu + 8 virtual devices
        graft.dryrun_multichip(8)
