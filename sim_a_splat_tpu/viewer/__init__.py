"""Interactive browser viewer for splat scenes (the viser analogue).

The reference's runtime depends on an out-of-process browser WebGL splat
renderer plus meshcat sliders (viser server at splat_handler.py:41, render
round-trip at splat_env_wrapper.py:148-157, meshcat sliders at
demo_joint_sliders_splat.py:104-107).  Here the renderer runs in-process on
the accelerator and the browser is a *thin* display: an stdlib-http server
streams JPEG frames and accepts orbit-camera / slider input.  Nothing in
the env loop depends on it — it is a human-facing debug/teleop surface.
"""

from sim_a_splat_tpu.viewer.server import SplatViewer, SliderSpec

__all__ = ["SplatViewer", "SliderSpec"]
