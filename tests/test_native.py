"""Native (C++ ctypes) IO runtime parity tests.

Each test builds csrc/librlrpt_io.so on demand (via utils.native) and is
skipped if no toolchain is available.
"""

import numpy as np
import pytest

from rlrpt_tpu.scene.obj_importer import normalise_vertices, parse_obj
from rlrpt_tpu.utils import native
from rlrpt_tpu.utils.image import read_bmp

pytestmark = pytest.mark.skipif(not native.have_native(),
                                reason="native library unavailable")

_MODELS = "/root/reference/Models"


# cube.obj regression: its first line begins with a SPACE (" v ...")
# — the native buffer-scan parser must skip leading whitespace.
@pytest.mark.parametrize("name", ["box.obj", "archway.obj", "bunny.obj",
                                  "cube.obj"])
def test_obj_parse_matches_python(name):
    path = f"{_MODELS}/{name}"
    v_n, f_n = native.parse_obj_native(path)
    v_p, f_p = parse_obj(path)
    v_p = normalise_vertices(v_p)
    np.testing.assert_allclose(v_n, v_p.astype(np.float32), atol=2e-5)
    assert (f_n == f_p).all()


def test_q_table_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pos = rng.random((7, 3), np.float32)
    q = rng.random((7, 12), np.float32)
    p = str(tmp_path / "q.txt")
    assert native.save_q_table_native(p, pos, q)
    pos2, q2 = native.load_q_table_native(p)
    np.testing.assert_allclose(pos, pos2, atol=1e-5)
    np.testing.assert_allclose(q, q2, atol=1e-5)
    # also readable by the python reader (format parity)
    from rlrpt_tpu.radiance.map_io import load_radiance_map_data
    pos3, q3, s = load_radiance_map_data(p)
    assert s == 12
    np.testing.assert_allclose(pos3, pos, atol=1e-5)


def test_bmp_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.random((19, 33, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.bmp")
    assert native.write_bmp_native(p, img)
    np.testing.assert_array_equal(read_bmp(p), img)
