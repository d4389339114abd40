"""Interactive viewer server: endpoints, orbit math, render caching."""

import json
import urllib.request

import numpy as np

from sim_a_splat_tpu.viewer import SliderSpec, SplatViewer
from sim_a_splat_tpu.viewer.server import orbit_pose


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _post(url, body):
    req = urllib.request.Request(url, data=json.dumps(body).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status


def test_orbit_pose_looks_at_target():
    q, t = orbit_pose(azim=0.3, elev=0.4, dist=2.5, target=[1.0, -2.0, 0.5])
    # rotation: unit quaternion, camera +z axis points at the target
    assert abs(np.linalg.norm(q) - 1.0) < 1e-6
    w, x, y, z = q
    R = np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    fwd = R[:, 2]
    to_target = np.asarray([1.0, -2.0, 0.5]) - t
    assert abs(np.linalg.norm(to_target) - 2.5) < 1e-5
    np.testing.assert_allclose(fwd, to_target / 2.5, atol=1e-6)


def test_viewer_endpoints_and_rerender():
    calls = []

    def render(q, t, sliders):
        calls.append((q.copy(), t.copy(), dict(sliders)))
        img = np.zeros((32, 48, 3), np.float32)
        img[..., 0] = sliders.get("joint1", 0.0)
        return img

    v = SplatViewer(render, sliders=[SliderSpec("joint1", -1.0, 1.0, 0.0)])
    try:
        code, ctype, body = _get(v.url)
        assert code == 200 and "text/html" in ctype
        assert b"sim-a-splat" in body

        code, ctype, body = _get(v.url + "frame.jpg")
        assert code == 200 and ctype == "image/jpeg"
        assert body[:2] == b"\xff\xd8"            # JPEG magic
        assert len(calls) == 1

        # cached: no re-render on second fetch
        _get(v.url + "frame.jpg")
        assert len(calls) == 1

        # camera move invalidates the cache
        assert _post(v.url + "camera", {"azim": 1.0}) == 200
        _get(v.url + "frame.jpg")
        assert len(calls) == 2

        # slider change reaches the render callback
        assert _post(v.url + "sliders", {"joint1": 0.5}) == 200
        _get(v.url + "frame.jpg")
        assert calls[-1][2]["joint1"] == 0.5

        code, _, body = _get(v.url + "state")
        state = json.loads(body)
        assert state["camera"]["azim"] == 1.0
        assert state["sliders"]["joint1"] == 0.5
    finally:
        v.close()
