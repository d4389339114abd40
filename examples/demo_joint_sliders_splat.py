"""Joint-slider demo: drive the arm splat env joint by joint at 10 Hz.

Twin of the reference's meshcat-slider demo (examples/
demo_joint_sliders_splat.py:13-124), which adds one meshcat slider per
joint and steps the splat env with the slider values forever.  There is no
meshcat here; two equivalents are provided:

- default: a scripted "slider sweep" — each joint in turn sweeps a sine
  through its range while the others hold, rendering every step
  (``--steps`` bounds the run, ``--out`` saves frames);
- ``--interactive``: read slider values from stdin as ``<joint> <value>``
  lines (e.g. ``2 0.7``), step at 10 Hz between inputs.

    python examples/demo_joint_sliders_splat.py --steps 30 --out /tmp/f
"""

import sys
import select
import time
from pathlib import Path

import click
import numpy as np

sys.path.append(str(Path(__file__).resolve().parent))
from common import log, make_manipulator_splat_env, save_ppm  # noqa: E402


@click.command()
@click.option("--steps", default=0, type=int, help="0 = run forever")
@click.option("--out", default="", type=str, help="frame output dir")
@click.option("--interactive", is_flag=True,
              help="read '<joint> <value>' lines from stdin")
@click.option("-hz", "--control_hz", default=10, type=int)
@click.option("--meshes", is_flag=True,
              help="overlay URDF link meshes on the splats "
                   "(splat_handler.py:145-197 twin)")
def main(steps, out, interactive, control_hz, meshes):
    splat_env = make_manipulator_splat_env(eef=False,
                                           robot_mesh_overlay=meshes)
    num_dof = splat_env.unwrapped.num_dof
    _ = splat_env.reset(reset_to_state={
        "robot_pos": [0.0] * num_dof,
        "block_pos": [0.0, 0.0, 0.0, 0.0],
        "goal_pos": [0.0, 0.0, 0.0, 0.0],
    })
    out_dir = Path(out) if out else None
    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)

    joint_values = np.zeros(num_dof)
    t = 0
    while steps == 0 or t < steps:
        if interactive:
            ready, _, _ = select.select([sys.stdin], [], [],
                                        1.0 / control_hz)
            if ready:
                line = sys.stdin.readline().split()
                if not line or line[0] in ("q", "quit"):
                    return
                j, v = int(line[0]), float(line[1])
                joint_values[j % num_dof] = v
        else:
            # scripted sweep: joint (t // 40) sines through ±0.8 rad
            j = (t // 40) % num_dof
            joint_values = joint_values * 0.95
            joint_values[j] = 0.8 * np.sin(2 * np.pi * (t % 40) / 40)
            time.sleep(0)   # keep the loop structure of the reference

        log(f"Joint values: {np.round(joint_values, 3)}")
        observation, reward, terminated, truncated, info_ = splat_env.step(
            joint_values, noobs=out_dir is None)
        if out_dir is not None and observation is not None:
            for ci in range(len(splat_env.render_cam_keys)):
                img = np.moveaxis(observation[f"camera_{ci}"], 0, -1)
                save_ppm(out_dir / f"t{t:04d}_cam{ci}.ppm", img)
        t += 1


if __name__ == "__main__":
    main()
