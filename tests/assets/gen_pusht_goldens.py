"""Generate the committed pushT ground-truth trajectories.

Runs the independent Chipmunk oracle (tests/chipmunk_oracle.py) over scripted
contact-rich agent paths and stores (start state, actions, per-control-step
observations) in ``pusht_goldens.npz``.  Regenerate with:

    python tests/assets/gen_pusht_goldens.py
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from chipmunk_oracle import PushTOracle  # noqa: E402

TRAJECTORIES = {
    # translation-dominant push through the T stem (slightly off-axis)
    "push_stem": {
        "start": [80.0, 313.0, 149.0, 256.0, 0.1],
        "actions": [[80.0 + 6.0 * i, 312.0] for i in range(30)],
    },
    # off-center push on the crossbar end -> sustained rotation
    "rotate_crossbar": {
        "start": [80.0, 270.0, 149.0, 256.0, 0.0],
        "actions": [[80.0 + 5.0 * i, 272.0] for i in range(30)],
    },
    # bulldoze the block into the left wall: agent + wall contacts, pinning
    "wall_pin": {
        "start": [200.0, 256.0, 120.0, 256.0, 0.0],
        "actions": [[200.0 - 5.0 * i, 256.0] for i in range(35)],
    },
    # legacy reset-ordering quirk exercised under contact
    "legacy_push": {
        "start": [80.0, 300.0, 160.0, 250.0, 0.8],
        "actions": [[80.0 + 5.0 * i, 298.0] for i in range(25)],
        "legacy": True,
    },
    # shifted center of gravity (block_cog ctor override); 18 steps — the
    # fast-spinning block then separates from the agent at a corner, a
    # chaotic event where trajectories legitimately fork
    "cog_override": {
        "start": [80.0, 270.0, 149.0, 256.0, 0.0],
        "actions": [[80.0 + 5.0 * i, 272.0] for i in range(18)],
        "block_cog": [-50.0, 15.0],
    },
}


def main():
    out = {}
    for name, spec in TRAJECTORIES.items():
        oracle = PushTOracle(block_cog=spec.get("block_cog"))
        start = np.asarray(spec["start"], float)
        oracle.set_state(start[:2], start[2:4], start[4],
                         legacy=spec.get("legacy", False))
        obs = [oracle.observation()]
        for act in spec["actions"]:
            oracle.control_step(np.asarray(act, float))
            obs.append(oracle.observation())
        out[f"{name}/start"] = start
        out[f"{name}/actions"] = np.asarray(spec["actions"], float)
        out[f"{name}/obs"] = np.asarray(obs, float)
        out[f"{name}/legacy"] = np.asarray(spec.get("legacy", False))
        cog = spec.get("block_cog")
        out[f"{name}/block_cog"] = np.asarray(
            [np.nan, np.nan] if cog is None else cog, float)
    path = pathlib.Path(__file__).with_name("pusht_goldens.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({len(TRAJECTORIES)} trajectories)")


if __name__ == "__main__":
    main()
