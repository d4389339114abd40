"""Teleop / datagen demo: pushT task driving the arm splat env.

TPU-native twin of the reference's main demo (examples/demo_pusht_splat.py:
16-175): a 2D pushT env (mouse teleop) provides EEF targets, mapped from
pixel space to the arm workspace; an IK wrapper turns them into joint
targets; the splat env renders camera observations every control step.

With a display, run interactively (mouse drags the agent; space = pause,
r = retry, q = quit).  Headless, ``--steps N`` runs a scripted pushing
policy and writes the splat camera frames as PPM files to ``--out``.

    python examples/demo_pusht_splat.py --steps 20 --out /tmp/frames
"""

import sys
from pathlib import Path

import click
import numpy as np

sys.path.append(str(Path(__file__).resolve().parent))
from common import HOME_Q, log, make_manipulator_splat_env, save_ppm  # noqa: E402


def map_actions(act):
    """pushT pixel coords → arm workspace meters (reference
    demo_pusht_splat.py:102-105, ranges fit to the pusharm6 reach)."""
    if act is None:
        return None
    return np.array([0.30 + 0.22 * act[0] / 298, 0.20 - 0.40 * act[1] / 512,
                     0.2])


def scripted_policy(obs, info, goal_pose):
    """Push the block toward the goal: aim the agent at the point behind
    the block along the block→goal line."""
    block = np.asarray(info["block_pose"][:2], np.float64)
    goal = np.asarray(goal_pose[:2], np.float64)
    d = goal - block
    d /= max(np.linalg.norm(d), 1e-6)
    return block - 40.0 * d


@click.command()
@click.option("-rs", "--render_size", default=96, type=int)
@click.option("-hz", "--control_hz", default=10, type=int)
@click.option("--steps", default=0, type=int,
              help="scripted steps (0 = interactive teleop)")
@click.option("--out", default="", type=str, help="frame output dir")
def main(render_size, control_hz, steps, out):
    from sim_a_splat_tpu.envs import PushTKeypointsEnv
    from sim_a_splat_tpu.ops import quaternion as quat
    import jax.numpy as jnp

    kp_kwargs = PushTKeypointsEnv.genenerate_keypoint_manager_params()
    env = PushTKeypointsEnv(render_size=render_size, render_action=False,
                            **kp_kwargs)

    interactive = steps == 0
    if interactive:
        import pygame
        pygame.init()
        screen = pygame.display.set_mode((298, 512))
        clock = pygame.time.Clock()
        agent = env.teleop_agent()

    splat_env = make_manipulator_splat_env(eef=True)
    num_dof = splat_env.unwrapped.num_dof
    out_dir = Path(out) if out else None
    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)

    episode = 0
    while True:
        obs = env.reset()
        info = env._get_info()
        goal_pose = env.goal_pose

        eef_pos = map_actions(info["pos_agent"])
        _ = splat_env.reset(reset_to_state={
            "robot_pos": HOME_Q[:num_dof],
            "block_pos": [0.0, 0.0, 0.0, 0.0],
            "goal_pos": [0.0, 0.0, 0.0, 0.0],
        })
        info_m = splat_env.unwrapped._get_info()
        eef_ori = np.asarray(quat.to_rpy(jnp.asarray(info_m["eef_quat"])))

        t = 0
        while True:
            if interactive:
                for event in pygame.event.get():
                    if event.type == pygame.QUIT:
                        return
                    if event.type == pygame.KEYDOWN:
                        if event.key == pygame.K_q:
                            return
                        if event.key == pygame.K_r:
                            t = -1
                act = agent.act(obs)
                if t < 0:
                    break
            else:
                act = scripted_policy(obs, env._get_info(), goal_pose)

            if act is not None:
                obs, reward, done, info = env.step(act)
                eef_action = {"eef_pos": map_actions(act),
                              "eef_ori": eef_ori}
                sobs, srew, sterm, strunc, sinfo = splat_env.step(
                    eef_action, noobs=False)
                if out_dir is not None:
                    for ci in range(len(splat_env.render_cam_keys)):
                        img = np.moveaxis(sobs[f"camera_{ci}"], 0, -1)
                        save_ppm(out_dir /
                                 f"ep{episode}_t{t:04d}_cam{ci}.ppm", img)
                log(f"ep {episode} t {t} pusht_reward {reward:.3f} "
                    f"sim_reward {srew:.3f}")
                if done:
                    break

            if interactive:
                frame = env.render("rgb_array")
                surf = pygame.surfarray.make_surface(
                    np.transpose(frame, (1, 0, 2)))
                surf = pygame.transform.scale(surf, (298, 512))
                screen.blit(surf, (0, 0))
                pygame.display.flip()
                clock.tick(control_hz)

            t += 1
            if not interactive and t >= steps:
                log(f"episode {episode}: completed {steps} scripted steps")
                return

        episode += 1


if __name__ == "__main__":
    main()
