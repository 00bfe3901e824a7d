"""Dump the optimized HLO of the city10000 warm-solve FW program to
/tmp/fw_hlo.txt, so trace op names (fusion.1624 etc. from
profile_trace.py) can be mapped back to source ops.

Works by recording the exact (args, kwargs) solve() passes to the jitted
_fw_impl, then AOT-lowering the same call (compile is cached).
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges
from mac_tpu.solvers import MAC, NaiveGreedy


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)
    mac = MAC(fixed, cands, n)
    rec = {}
    orig = mac._fw_jit

    def wrapper(*a, **kw):
        rec["a"], rec["kw"] = a, kw
        return orig(*a, **kw)

    mac._fw_jit = wrapper
    mac.solve(k, x_init, use_cache=True)
    txt = orig.lower(*rec["a"], **rec["kw"]).compile().as_text()
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/fw_hlo.txt")
    out.write_text(txt)
    print(f"wrote {out} ({len(txt)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
