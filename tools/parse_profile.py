"""Summarize a jax.profiler device trace (bench.py --profile DIR) into a
per-HLO-category time table — the TPU answer to "where does the UNet step go".

    python tools/parse_profile.py /tmp/jaxprof [top_n]

Parses the ``*.xplane.pb`` capture directly with the XPlane proto (the
tensorboard-plugin-profile converters need a matching pywrap build, which
this environment lacks). For every device plane it aggregates XLA-op event
durations by the op's ``hlo_category`` stat and prints category shares plus
the top-N individual ops by total time.
"""

from __future__ import annotations

import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def find_xplanes(root: str) -> list[str]:
    hits = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True))
    if not hits:
        raise SystemExit(f"no *.xplane.pb under {root} — did the traced run execute on device?")
    return hits


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    for path in find_xplanes(root):
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        print(f"# {path}")
        for plane in space.planes:
            is_device = "TPU" in plane.name or "/device:" in plane.name
            if not is_device:
                continue
            ev_meta = plane.event_metadata
            stat_meta = plane.stat_metadata
            for line in plane.lines:
                if not line.events:
                    continue
                by_cat: dict[str, float] = collections.defaultdict(float)
                by_op: dict[str, float] = collections.defaultdict(float)
                op_cat: dict[str, str] = {}
                total_ps = 0.0
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name if ev.metadata_id in ev_meta else "?"
                    dur = float(ev.duration_ps)
                    cat = ""
                    for st in ev.stats:
                        sname = stat_meta[st.metadata_id].name if st.metadata_id in stat_meta else ""
                        if sname == "hlo_category":
                            cat = st.str_value or (stat_meta[st.ref_value].name if st.ref_value in stat_meta else "")
                    # also look on the event metadata's stats (per-op constants)
                    if not cat and ev.metadata_id in ev_meta:
                        for st in ev_meta[ev.metadata_id].stats:
                            sname = stat_meta[st.metadata_id].name if st.metadata_id in stat_meta else ""
                            if sname == "hlo_category":
                                cat = st.str_value or (stat_meta[st.ref_value].name if st.ref_value in stat_meta else "")
                    cat = cat or "(uncategorized)"
                    by_cat[cat] += dur
                    by_op[name] += dur
                    op_cat[name] = cat
                    total_ps += dur
                if total_ps <= 0:
                    continue
                print(f"\n## plane '{plane.name}' line '{line.name}' — total {total_ps / 1e12:.4f} s busy")
                print("### by hlo_category")
                for cat, ps in sorted(by_cat.items(), key=lambda kv: -kv[1]):
                    share = 100 * ps / total_ps
                    if share >= 0.2:
                        print(f"  {share:5.1f}%  {ps / 1e12:8.4f} s  {cat}")
                print(f"### top {top_n} ops")
                for name, ps in sorted(by_op.items(), key=lambda kv: -kv[1])[:top_n]:
                    print(f"  {100 * ps / total_ps:5.1f}%  {ps / 1e12:8.4f} s  [{op_cat[name]}] {name[:110]}")


if __name__ == "__main__":
    main()
