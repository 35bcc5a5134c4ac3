"""Multi-host runner: N OS processes, one per contiguous time block.

The process-level analog of BASELINE config 5: each "host" is a separate
process with its own LTESnifferCore and tracker state; the parent performs
the ownership merge (`parallel.multihost`).  On real deployments each
process runs on its own host/chips and ingests its block of the stream;
here the blocks come from one trace file.

Usage:
    python scripts/run_multihost.py -i trace.iq -c 55 -p 50 -P 2 \
        -n 2 -o merged.pcap [--overlap 200]

Child protocol (internal): --child <host_idx> runs one block and writes
host<k>.pcap + host<k>.json (decode results) into --workdir.
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor JAX_PLATFORMS even when a sitecustomize pre-imported jax and
# registered a TPU plugin (its env-var handling runs too early)
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-c", "--cell-id", type=int, required=True)
    p.add_argument("-p", "--prb", type=int, default=50)
    p.add_argument("-P", "--ports", type=int, default=2)
    p.add_argument("-n", "--hosts", type=int, default=2)
    p.add_argument("-o", "--output", default="merged.pcap")
    p.add_argument("-B", "--batch", type=int, default=32)
    p.add_argument("--overlap", type=int, default=200)
    p.add_argument("--workdir", default=None)
    p.add_argument("--child", type=int, default=None, help=argparse.SUPPRESS)
    return p


def _cell(args):
    from ltesniffer_tpu.phy.params import CellConfig
    return CellConfig(n_id_cell=args.cell_id, n_prb=args.prb,
                      nof_ports=args.ports, nof_rx_ant=1)


def run_child(args) -> int:
    from ltesniffer_tpu.io import iq as iq_mod
    from ltesniffer_tpu.parallel import multihost
    from ltesniffer_tpu.sniffer import core

    cell = _cell(args)
    samples = iq_mod.read_iq(args.input)
    blocks = multihost.split_blocks(samples, args.hosts, cell,
                                    overlap_sf=args.overlap)
    blk = blocks[args.child]

    def factory(b):
        cfg = core.SnifferConfig(
            cell=cell, batch_size=args.batch,
            pcap_path=os.path.join(args.workdir, f"host{b.host}.pcap"))
        return core.LTESnifferCore(cfg)

    c = multihost.run_block(factory, blk)
    c.close()
    with open(os.path.join(args.workdir, f"host{args.child}.json"), "w") as f:
        json.dump({"summary": c.summary(),
                   "results": [dict(sfn=r.dci.sfn, sf_idx=r.dci.sf_idx,
                                    rnti=r.dci.rnti, fmt=r.dci.fmt,
                                    ncce=r.dci.ncce, crc_ok=r.crc_ok,
                                    tbs=r.tbs)
                               for r in c.results]}, f)
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.child is not None:
        return run_child(args)

    import tempfile
    args.workdir = args.workdir or tempfile.mkdtemp(prefix="mh_")
    os.makedirs(args.workdir, exist_ok=True)
    procs = []
    for h in range(args.hosts):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "-i", args.input, "-c", str(args.cell_id), "-p", str(args.prb),
             "-P", str(args.ports), "-n", str(args.hosts),
             "-B", str(args.batch), "--overlap", str(args.overlap),
             "--workdir", args.workdir, "--child", str(h)]))
    rcs = [p.wait() for p in procs]
    if any(rcs):
        print(f"[multihost] child failures: {rcs}", file=sys.stderr)
        return 1

    # ownership merge of the per-host pcaps
    from ltesniffer_tpu.io import iq as iq_mod, pcap as pcap_mod
    from ltesniffer_tpu.parallel import multihost
    cell = _cell(args)
    samples = iq_mod.read_iq(args.input)
    blocks = multihost.split_blocks(samples, args.hosts, cell,
                                    overlap_sf=args.overlap)
    per_host = [pcap_mod.read_pcap(os.path.join(args.workdir,
                                                f"host{h}.pcap"))
                for h in range(args.hosts)]
    merged = multihost.merge_pcap_records(per_host, blocks)
    w = pcap_mod.MacLtePcapWriter(args.output)
    for r in merged:
        w.write_pdu(r["payload"], rnti=r["rnti"], direction=r["direction"],
                    sfn=r["sfn"], sf_idx=r["sf_idx"],
                    crc_ok=r.get("crc_ok", True), retx=r.get("retx", 0))
    w.close()
    print(f"[multihost] {args.hosts} hosts -> {len(merged)} merged records "
          f"-> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
