"""Utils: config round-trip, episode recorder, checkpointing, timer."""

import numpy as np
import jax
import jax.numpy as jnp

from sim_a_splat_tpu.utils import (
    CameraConfig, EpisodeRecorder, ExperimentConfig, RasterSettings, Timer,
    restore_checkpoint, save_checkpoint, time_jitted,
)


def test_config_roundtrip(tmp_path):
    cfg = ExperimentConfig(
        cameras={0: CameraConfig(type="viewport", render_size=(240, 320)),
                 1: CameraConfig(type="moving", link_name="link6",
                                 local_frame_t=(0.0, 0.0, -0.3))},
        raster=RasterSettings(tile_capacity=512),
        seed=7,
    )
    cfg.save(tmp_path / "cfg.json")
    back = ExperimentConfig.load(tmp_path / "cfg.json")
    assert back.seed == 7
    assert back.cameras[1].link_name == "link6"
    assert back.raster.tile_capacity == 512
    rc = back.raster.to_raster_config()
    assert rc.tile_capacity == 512


def test_episode_recorder_roundtrip(tmp_path):
    rec = EpisodeRecorder(tmp_path / "data")
    for t in range(5):
        rec.add_step(obs={"image": np.zeros((3, 8, 8)) + t,
                          "agent_pos": np.asarray([t, 0.0])},
                     action=np.asarray([1.0, 2.0]),
                     reward=float(t))
    p = rec.end_episode(seed=3)
    ep = EpisodeRecorder.load_episode(p)
    assert ep["obs"]["image"].shape == (5, 3, 8, 8)
    assert ep["action"].shape == (5, 2)
    np.testing.assert_allclose(ep["reward"], np.arange(5.0))
    # second episode, index grows
    rec.add_step(obs={"image": np.ones((3, 8, 8)),
                      "agent_pos": np.zeros(2)},
                 action=np.zeros(2), reward=0.0)
    rec.end_episode()
    import json
    idx = json.loads((tmp_path / "data" / "index.json").read_text())
    assert len(idx) == 2 and idx[0]["length"] == 5


def test_checkpoint_roundtrip(tmp_path):
    tree = {"scene": {"means": jnp.arange(12.0).reshape(4, 3)},
            "step": jnp.asarray(7)}
    save_checkpoint(tmp_path / "ckpt", tree)
    back = restore_checkpoint(tmp_path / "ckpt", jax.tree.map(
        lambda x: jnp.zeros_like(x), tree))
    np.testing.assert_allclose(np.asarray(back["scene"]["means"]),
                               np.asarray(tree["scene"]["means"]))
    assert int(back["step"]) == 7


def test_timer_and_time_jitted():
    t = Timer()
    x = jnp.ones((64, 64))
    with t.section("matmul", block_on=None):
        y = x @ x
    assert "matmul" in t.summary()
    mean_s, out = time_jitted(lambda a: a @ a, x, iters=3, name=None)
    assert mean_s > 0 and out.shape == (64, 64)
