"""Browser-viewer demo: orbit the arm splat scene and drive joints live.

The in-process twin of the reference's "open viser in a browser + meshcat
sliders" experience (splat_env_wrapper.py:87-94 blocks on a browser client;
demo_joint_sliders_splat.py:104-107 meshcat sliders): here the browser is a
thin display — frames are rendered by the TPU/CPU tile rasterizer inside
this process and streamed as JPEGs; sliders post joint values back.

    python examples/demo_viewer.py                 # serve until ctrl-c
    python examples/demo_viewer.py --selftest      # headless one-frame check
"""

import sys
import time
from pathlib import Path

import click
import numpy as np

sys.path.append(str(Path(__file__).resolve().parent))
from common import log, make_manipulator_splat_env  # noqa: E402


@click.command()
@click.option("--port", default=8787, type=int)
@click.option("--size", default=320, type=int, help="render height")
@click.option("--selftest", is_flag=True, help="render one frame and exit")
def main(port, size, selftest):
    import jax.numpy as jnp

    from sim_a_splat_tpu.ops import Camera, SE3
    from sim_a_splat_tpu.viewer import SliderSpec, SplatViewer

    splat_env = make_manipulator_splat_env(eef=False,
                                           render_size=(size, size))
    num_dof = splat_env.unwrapped.num_dof
    splat_env.reset(reset_to_state={
        "robot_pos": [0.0] * num_dof,
        "block_pos": [0.35, 0.1, 0.0, 0.0],
        "goal_pos": [0.45, -0.1, 0.0, 0.0],
    })
    def render(q, t, sliders):
        joints = np.asarray([sliders.get(f"joint{i}", 0.0)
                             for i in range(num_dof)], np.float32)
        splat_env.step(joints, noobs=True)
        cam = Camera.from_fov(
            SE3(jnp.asarray(q), jnp.asarray(t)), 1.05, size, size)
        return splat_env.render_free_camera(cam)

    viewer = SplatViewer(
        render,
        sliders=[SliderSpec(f"joint{i}", -3.14, 3.14, 0.0)
                 for i in range(num_dof)],
        port=0 if selftest else port,
        dist=1.8, elev=0.6, target=(0.35, 0.0, 0.2),
    )
    log(f"viewer serving at {viewer.url}")
    try:
        if selftest:
            jpg = viewer.render_jpeg()
            assert jpg[:2] == b"\xff\xd8" and len(jpg) > 1000
            log(f"selftest ok: {len(jpg)} byte frame")
            return
        while True:
            time.sleep(1.0)
    except KeyboardInterrupt:
        pass
    finally:
        viewer.close()
        splat_env.close()


if __name__ == "__main__":
    main()
