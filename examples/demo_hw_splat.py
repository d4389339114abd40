"""Hardware-mirror demo: external joint states drive the splat env.

Twin of the reference's ROS 2 digital-twin demo (examples/demo_hw_splat.py:
30-136): a subscriber on ``/joint_state`` (degrees) applies per-joint sign
and offset compensation and steps the splat env — a real robot mirrored
into the photorealistic scene.  Sources, in order of preference:

- ``--ros``: ROS 2 ``rclpy`` subscription (exactly the reference path;
  requires a sourced ROS 2 environment — gated import as in the original);
- default: a UDP listener on ``--port`` accepting JSON arrays of joint
  angles in degrees (``echo '[10,0,0,0,0,0]' | nc -u localhost 9870``);
- ``--replay N``: N steps of a synthetic joint-state stream (CI/smoke).

The non-identity base weld of the reference demo (demo_hw_splat.py:58) is
kept to exercise the weld path.
"""

import json
import socket
import sys
from functools import partial
from pathlib import Path

import click
import numpy as np

sys.path.append(str(Path(__file__).resolve().parent))
from common import log, make_manipulator_splat_env, NUM_DOF  # noqa: E402

# hw interface compensation (reference demo_hw_splat.py:26-27)
DEFAULT_JOINT_STATE = np.zeros(NUM_DOF)
JOINT_SIGNS = np.array([-1, 1, -1, 1, 1, 1], dtype=np.float64)[:NUM_DOF]


def create_splat_env():
    env = make_manipulator_splat_env(
        eef=False,
        weld_frame_transform=((1.0, 0.0, 0.0, 0.0), (0.65, -1.23, 0.42)))
    _ = env.reset(reset_to_state={
        "robot_pos": DEFAULT_JOINT_STATE,
        "block_pos": [0.0, 0.0, 0.0, 0.0],
        "goal_pos": [0.0, 0.0, 0.0, 0.0],
    })
    return env


def joint_state_callback(msg_data, env=None):
    """Degrees → compensated radians → env step (reference :113-119)."""
    joint_states = np.asarray(msg_data, np.float64) * np.pi / 180.0
    joint_states = joint_states * JOINT_SIGNS + DEFAULT_JOINT_STATE
    observation, reward, terminated, truncated, info_ = env.step(
        joint_states, noobs=True)
    log(f"mirrored q = {np.round(joint_states, 3)}")


@click.command()
@click.option("--ros", is_flag=True, help="use a ROS 2 /joint_state topic")
@click.option("--port", default=9870, type=int, help="UDP port (non-ROS)")
@click.option("--replay", default=0, type=int,
              help="steps of synthetic stream instead of listening")
def main(ros, port, replay):
    env = create_splat_env()

    if replay > 0:
        for t in range(replay):
            deg = 25.0 * np.sin(2 * np.pi * t / replay + np.arange(NUM_DOF))
            joint_state_callback(deg, env=env)
        return

    if ros:
        try:
            import rclpy
            from rclpy.node import Node
            from std_msgs.msg import Float32MultiArray
        except ImportError:
            raise ImportError(
                "rclpy is required for --ros. Source the ROS 2 environment "
                "before running this script.")
        rclpy.init(args=None)
        node = Node("splat_mirror_node")
        node.get_logger().info("Joint state listener node initialized")
        node.create_subscription(
            Float32MultiArray, "/joint_state",
            lambda msg: joint_state_callback(msg.data, env=env), 10)
        rclpy.spin(node)
        return

    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", port))
    log(f"listening for JSON joint states (degrees) on udp://127.0.0.1:{port}")
    cb = partial(joint_state_callback, env=env)
    while True:
        data, _ = sock.recvfrom(65536)
        try:
            cb(json.loads(data.decode()))
        except (ValueError, KeyError) as e:
            log(f"bad packet: {e}")


if __name__ == "__main__":
    main()
