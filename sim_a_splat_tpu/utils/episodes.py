"""Episode recording and checkpoint/resume.

The reference declares zarr datagen dependencies but ships no storage code
(SURVEY.md §5 "Checkpoint / resume"); its only checkpoints are nerfstudio's.
Here:

- :class:`EpisodeRecorder` — append steps (obs/action/reward/done pytrees),
  flush episodes to compressed ``.npz`` shards with an index file; the
  diffusion-policy-style datagen sink the reference's teleop loop implies.
- :func:`save_checkpoint` / :func:`restore_checkpoint` — orbax-backed
  checkpointing of arbitrary pytrees (env states, scenes, optimizer state)
  for long datagen/training runs on preemptible TPU pods.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax


class EpisodeRecorder:
    def __init__(self, out_dir: str | Path):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self._steps: list = []
        self._episode = 0
        self._index: list = []

    def add_step(self, **fields) -> None:
        self._steps.append(jax.tree.map(np.asarray, fields))

    def end_episode(self, **meta) -> Path:
        """Stack the buffered steps and write one npz shard."""
        if not self._steps:
            raise ValueError("no steps buffered")
        stacked: dict = {}
        keys = self._steps[0].keys()
        for k in keys:
            leaves = [s[k] for s in self._steps]
            if isinstance(leaves[0], dict):
                for sub in leaves[0]:
                    stacked[f"{k}.{sub}"] = np.stack(
                        [l[sub] for l in leaves])
            else:
                stacked[k] = np.stack(leaves)
        path = self.out_dir / f"episode_{self._episode:06d}.npz"
        self._write_npz(path, stacked)
        self._index.append({"episode": self._episode,
                            "length": len(self._steps),
                            "file": path.name, **meta})
        (self.out_dir / "index.json").write_text(
            json.dumps(self._index, indent=2))
        self._steps = []
        self._episode += 1
        return path

    @staticmethod
    def _write_npz(path: Path, stacked: dict) -> None:
        """Native multithreaded-deflate npz writer (sim_a_splat_tpu.native)
        when available — image-observation episodes compress at datagen
        rate — else ``np.savez_compressed``.  Both produce standard npz."""
        from sim_a_splat_tpu import native

        if native.available():
            try:
                native.npz_write(path, stacked)
                return
            except OSError:      # zip32 overflow → zip64-capable fallback
                pass
        np.savez_compressed(path, **stacked)

    @staticmethod
    def load_episode(path: str | Path) -> dict:
        z = np.load(path)
        out: dict = {}
        for k in z.files:
            if "." in k:
                top, sub = k.split(".", 1)
                out.setdefault(top, {})[sub] = z[k]
            else:
                out[k] = z[k]
        return out


def save_checkpoint(path: str | Path, tree) -> None:
    """Orbax checkpoint of any pytree (atomic, multi-host aware)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).absolute(), tree, force=True)


def restore_checkpoint(path: str | Path, like):
    """Restore into the structure/shardings of ``like``."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute(), like)
