"""tools/profile.py: xplane rollup on a synthetic trace."""
import pytest

pb = pytest.importorskip(
    "tensorflow.tsl.profiler.protobuf.xplane_pb2",
    reason="tensorflow profiler protos not available")

from hmvit_tpu.tools.profile import (  # noqa: E402
    device_op_totals,
    op_kind,
    summarize,
)


def make_xspace():
    xs = pb.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "%fusion.12 = f32[8]"
    plane.event_metadata[2].id = 2
    plane.event_metadata[2].name = "%copy.3 = bf16[4]"
    line = plane.lines.add()
    line.name = "XLA Ops"
    for mid, dur in ((1, 5_000_000), (1, 3_000_000), (2, 2_000_000)):
        ev = line.events.add()
        ev.metadata_id = mid
        ev.duration_ps = dur
    # a non-device plane that must be ignored
    host = xs.planes.add()
    host.name = "/host:CPU"
    return xs


def test_op_kind():
    assert op_kind("%fusion.12 = f32[8]") == "fusion"
    assert op_kind("%copy.3 = bf16[4]") == "copy"
    assert op_kind("dynamic-update-slice.7 = x") == "dynamic-update-slice"


def test_device_op_totals_and_summarize(tmp_path):
    xs = make_xspace()
    agg, cnt = device_op_totals(xs)
    assert agg["%fusion.12 = f32[8]"] == 8_000_000
    assert cnt["%fusion.12 = f32[8]"] == 2
    assert agg["%copy.3 = bf16[4]"] == 2_000_000

    d = tmp_path / "plugins" / "profile" / "x"
    d.mkdir(parents=True)
    (d / "t.xplane.pb").write_bytes(xs.SerializeToString())
    res = summarize(str(tmp_path), top=5, frames=2)
    assert res["total_ms"] == pytest.approx(10.0 / 1e3 / 2)
    assert res["by_kind"]["fusion"] == pytest.approx(8.0 / 1e3 / 2)
