"""Loaders producing :class:`GaussianScene` pytrees.

Covers the reference's loader family (sim_a_splat/splat/splat_utils.py):

- ``load_json``        ← ``GSplatLoader.load_gsplat_from_json`` (:51-89):
  JSON with keys means/rotations/colors/opacities/scalings holding *raw*
  (pre-activation) values.
- ``load_nerfstudio``  ← ``GSplatLoader.load_gsplat_from_nerfstudio``
  (:24-49): splatfacto checkpoint dir (torch ckpt read host-side, params
  moved to jnp; never touches CUDA).
- ``load_ply``         : the standard INRIA/gsplat .ply export layout.
- ``synthetic_scene``  ← ``DummyGSplatLoader`` (:132-149): deterministic toy
  scenes for tests/figures.
- ``load_npz`` / ``save_npz``: this framework's native fast format.

All loaders return raw parameters; activations live on the scene pytree.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from sim_a_splat_tpu.splat.scene import GaussianScene
from sim_a_splat_tpu.ops import sh as sh_ops


def _to_scene(means, quats, log_scales, logit_opacities, sh_dc, sh_rest=None,
              dtype=jnp.float32) -> GaussianScene:
    return GaussianScene(
        means=jnp.asarray(means, dtype),
        quats=jnp.asarray(quats, dtype),
        log_scales=jnp.asarray(log_scales, dtype),
        logit_opacities=jnp.asarray(logit_opacities, dtype).reshape(-1),
        sh_dc=jnp.asarray(sh_dc, dtype),
        sh_rest=None if sh_rest is None else jnp.asarray(sh_rest, dtype),
    )


def load_json(path: str | Path) -> GaussianScene:
    """JSON dump with raw params (reference schema, splat_utils.py:56)."""
    with open(path, "r") as f:
        data = json.load(f)
    means = np.asarray(data["means"], np.float32)
    quats = np.asarray(data["rotations"], np.float32)
    log_scales = np.asarray(data["scalings"], np.float32)
    logit_opacities = np.asarray(data["opacities"], np.float32)
    # reference stores colors as raw SH-DC ("features_dc"-like); accept either
    colors = np.asarray(data["colors"], np.float32)
    sh_dc = colors if data.get("colors_are_sh", True) else sh_ops.rgb_to_sh(colors)
    return _to_scene(means, quats, log_scales, logit_opacities, sh_dc)


def load_nerfstudio(checkpoint_dir: str | Path) -> GaussianScene:
    """Load a splatfacto model from a nerfstudio run directory.

    ``checkpoint_dir`` is the run dir containing ``nerfstudio_models/
    step-*.ckpt`` (the reference passes the analogous config dir to
    ``GaussianSplat``/``eval_setup``, splat_utils.py:24-33).  The torch
    checkpoint is read host-side with CPU torch; gaussian params live under
    ``pipeline`` keys ``_model.gauss_params.{means,quats,scales,opacities,
    features_dc,features_rest}`` (splatfacto layout).
    """
    import torch

    checkpoint_dir = Path(checkpoint_dir)
    ckpts = sorted(checkpoint_dir.rglob("step-*.ckpt"))
    if not ckpts:
        raise FileNotFoundError(f"no step-*.ckpt under {checkpoint_dir}")
    state = torch.load(ckpts[-1], map_location="cpu", weights_only=False)
    pipeline = state["pipeline"] if "pipeline" in state else state

    def find(suffix):
        for k, v in pipeline.items():
            if k.endswith(suffix):
                return v.detach().cpu().numpy()
        raise KeyError(f"no key ending in {suffix!r} in checkpoint")

    means = find("gauss_params.means")
    quats = find("gauss_params.quats")
    log_scales = find("gauss_params.scales")
    logit_opacities = find("gauss_params.opacities")
    sh_dc = find("gauss_params.features_dc")
    try:
        sh_rest = find("gauss_params.features_rest")
        if sh_rest.size == 0:
            sh_rest = None
    except KeyError:
        sh_rest = None
    return _to_scene(means, quats, log_scales, logit_opacities, sh_dc, sh_rest)


# INRIA/gsplat .ply property layout
def load_ply(path: str | Path) -> GaussianScene:
    """Standard 3DGS .ply export (binary_little_endian, x y z nx ny nz
    f_dc_* f_rest_* opacity scale_* rot_*)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = 0
        props = []
        for line in header:
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property float"):
                props.append(line.split()[-1])
        data = np.frombuffer(f.read(n * len(props) * 4), dtype="<f4")
    data = data.reshape(n, len(props))
    col = {p: i for i, p in enumerate(props)}

    means = data[:, [col["x"], col["y"], col["z"]]]
    sh_dc = data[:, [col["f_dc_0"], col["f_dc_1"], col["f_dc_2"]]]
    n_rest = sum(1 for p in props if p.startswith("f_rest_"))
    if n_rest:
        rest = data[:, [col[f"f_rest_{i}"] for i in range(n_rest)]]
        # ply stores channel-major (all R coeffs, all G, all B)
        k = n_rest // 3
        sh_rest = rest.reshape(n, 3, k).transpose(0, 2, 1)
    else:
        sh_rest = None
    logit_opacities = data[:, col["opacity"]]
    log_scales = data[:, [col["scale_0"], col["scale_1"], col["scale_2"]]]
    quats = data[:, [col["rot_0"], col["rot_1"], col["rot_2"], col["rot_3"]]]
    return _to_scene(means, quats, log_scales, logit_opacities, sh_dc, sh_rest)


def load_npz(path: str | Path) -> GaussianScene:
    z = np.load(path)
    return _to_scene(
        z["means"], z["quats"], z["log_scales"], z["logit_opacities"],
        z["sh_dc"], z["sh_rest"] if "sh_rest" in z.files else None,
    )


def save_npz(path: str | Path, scene: GaussianScene) -> None:
    arrays = dict(
        means=np.asarray(scene.means),
        quats=np.asarray(scene.quats),
        log_scales=np.asarray(scene.log_scales),
        logit_opacities=np.asarray(scene.logit_opacities),
        sh_dc=np.asarray(scene.sh_dc),
    )
    if scene.sh_rest is not None:
        arrays["sh_rest"] = np.asarray(scene.sh_rest)
    np.savez_compressed(path, **arrays)


def load(path: str | Path) -> GaussianScene:
    """Dispatch on extension/dir — the ``GSplatLoader.__init__`` analogue
    (splat_utils.py:17-22), with .ply/.npz additionally supported."""
    path = Path(path)
    if path.is_dir():
        return load_nerfstudio(path)
    ext = path.suffix.lower()
    if ext == ".json":
        return load_json(path)
    if ext == ".ply":
        return load_ply(path)
    if ext == ".npz":
        return load_npz(path)
    raise ValueError(f"unsupported splat format: {path}")


def synthetic_scene(
    n: int = 64,
    seed: int = 0,
    extent: float = 1.0,
    scale_range: tuple[float, float] = (0.02, 0.08),
    sh_degree: int = 0,
) -> GaussianScene:
    """Deterministic random toy scene (the ``DummyGSplatLoader`` analogue,
    splat_utils.py:132-149) for tests, figures, and benchmarks."""
    rng = np.random.default_rng(seed)
    means = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    log_scales = np.log(
        rng.uniform(scale_range[0], scale_range[1], (n, 3))
    ).astype(np.float32)
    logit_opacities = rng.uniform(0.5, 3.0, (n,)).astype(np.float32)
    rgb = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    sh_dc = np.asarray(sh_ops.rgb_to_sh(rgb), np.float32)
    if sh_degree > 0:
        k = (sh_degree + 1) ** 2 - 1
        sh_rest = (rng.normal(size=(n, k, 3)) * 0.1).astype(np.float32)
    else:
        sh_rest = None
    return _to_scene(means, quats, log_scales, logit_opacities, sh_dc, sh_rest)


def aabb_mask(scene: GaussianScene, bounds: np.ndarray) -> jnp.ndarray:
    """Boolean mask of gaussians inside an axis-aligned box (3, 2) —
    the optional crop in the reference loader path (splat_handler.py:90-96)."""
    lo, hi = jnp.asarray(bounds[:, 0]), jnp.asarray(bounds[:, 1])
    return jnp.all((scene.means >= lo) & (scene.means <= hi), axis=-1)
