"""Mesh export parity: dawn_tpu.pipeline.mesh_io vs the ACTUAL reference
serialization.py (extract_init_states/utils/serialization.py), executed with
its two relative imports shimmed (get_suffix re-implemented verbatim-
semantics, _to_ctype unused by the writer paths). Byte-for-byte file
comparison; the reference takes cv2 BGR images where mesh_io takes RGB, so
the reference gets the channel-flipped copy."""

import os

import numpy as np
import pytest

from dawn_tpu.pipeline import mesh_io

REF = "/root/reference/extract_init_states/utils/serialization.py"


@pytest.fixture(scope="module")
def ref_ser():
    if not os.path.exists(REF):
        pytest.skip("reference tree unavailable")
    src = open(REF).read()
    src = src.replace("from .tddfa_util import _to_ctype", "")
    src = src.replace("from .functions import get_suffix", "")
    ns = {"get_suffix": lambda fn: fn[fn.rfind("."):] if "." in fn else "",
          "_to_ctype": lambda a: a}
    exec(compile(src, REF, "exec"), ns)
    return ns


@pytest.fixture()
def mesh():
    rng = np.random.RandomState(7)
    ver_lst = [np.asarray(rng.uniform(0, 120, (3, 25)), np.float32)
               for _ in range(2)]
    tri = rng.randint(0, 25, (30, 3)).astype(np.int32)
    img = rng.randint(0, 255, (128, 128, 3)).astype(np.uint8)   # RGB
    return ver_lst, tri, img


def test_ply_single_parity(ref_ser, mesh, tmp_path, capsys):
    ver_lst, tri, _ = mesh
    ref_ser["ser_to_ply_single"](ver_lst, tri, 128, str(tmp_path / "ref.ply"))
    got = mesh_io.ser_to_ply(ver_lst, tri, 128, str(tmp_path / "got.ply"))
    assert [os.path.basename(p) for p in got] == ["got_1.ply", "got_2.ply"]
    for i in (1, 2):
        ref = (tmp_path / f"ref_{i}.ply").read_text()
        assert (tmp_path / f"got_{i}.ply").read_text() == ref


def test_ply_merged_parity(ref_ser, mesh, tmp_path, capsys):
    ver_lst, tri, _ = mesh
    ref_ser["ser_to_ply_multiple"](ver_lst, tri, 128,
                                   str(tmp_path / "ref.ply"))
    got = mesh_io.ser_to_ply(ver_lst, tri, 128, str(tmp_path / "got.ply"),
                             merge=True)
    assert got == [str(tmp_path / "got.ply")]
    assert ((tmp_path / "got.ply").read_text()
            == (tmp_path / "ref.ply").read_text())


def test_obj_single_parity(ref_ser, mesh, tmp_path, capsys):
    ver_lst, tri, img = mesh
    # reference mutates ver in get_colors (clipping in place) — give it
    # copies; it also expects BGR
    ref_ser["ser_to_obj_single"](img[..., ::-1],
                                 [v.copy() for v in ver_lst], tri, 128,
                                 str(tmp_path / "ref.obj"))
    mesh_io.ser_to_obj(img, ver_lst, tri, 128, str(tmp_path / "got.obj"))
    for i in (1, 2):
        assert ((tmp_path / f"got_{i}.obj").read_text()
                == (tmp_path / f"ref_{i}.obj").read_text())


def test_obj_merged_parity(ref_ser, mesh, tmp_path, capsys):
    ver_lst, tri, img = mesh
    ref_ser["ser_to_obj_multiple"](img[..., ::-1],
                                   [v.copy() for v in ver_lst], tri, 128,
                                   str(tmp_path / "ref.obj"))
    mesh_io.ser_to_obj(img, ver_lst, tri, 128, str(tmp_path / "got.obj"),
                       merge=True)
    assert ((tmp_path / "got.obj").read_text()
            == (tmp_path / "ref.obj").read_text())


def test_ply_is_valid_and_upright(mesh, tmp_path):
    """Sanity independent of the reference: header counts match the body,
    y is flipped (height - y), winding reversed."""
    ver_lst, tri, _ = mesh
    path = mesh_io.ser_to_ply(ver_lst[:1], tri, 128,
                              str(tmp_path / "m.ply"))[0]
    lines = open(path).read().splitlines()
    assert lines[0] == "ply"
    assert f"element vertex {ver_lst[0].shape[1]}" in lines
    assert f"element face {len(tri)}" in lines
    body = lines[lines.index("end_header") + 2:]   # reference's blank line
    vline = body[0].split()
    assert float(vline[1]) == pytest.approx(128 - ver_lst[0][1, 0], abs=0.01)
    f0 = body[ver_lst[0].shape[1]].split()
    assert f0[0] == "3" and [int(f0[3]), int(f0[2]), int(f0[1])] == list(tri[0])
