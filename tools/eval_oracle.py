#!/usr/bin/env python3
"""Third independent check on the CLEAR/Identity metrics: a direct
transliteration of the reference's compute_sequence_metrics
(reference src/utils/eval.py:174-457) run over the SAME derived
gt/tracks tables (rebuilt in DuckDB from the shared CTE text inside the
m02 oracle), compared against the engine's m02 parquet output.

Deterministic-pin alignment with the engine (documented deviations):
  - IoU argmax ties -> lowest track id (iterate tracks sorted asc).
  - duplicate-claim overwrite -> highest gt id wins (insert gts asc).

Usage: python3 tools/eval_oracle.py [sfdir] [verify_outdir]
"""
import json, sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
IOU_T = 0.3

con = duckdb.connect()
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
sql = json.load(open(f"{OUT}/oracle_sql.json"))["m02_clear_metrics"]
pre = sql[:sql.rindex("SELECT g.seq")]
gt_rows = con.execute(pre + "SELECT seq, frameIdx, id, x, y, w, h FROM gt").fetchall()
tr_rows = con.execute(pre + "SELECT seq, frameIdx, id, x, y, w, h FROM tracks").fetchall()


def by_frame(rows):
    d = {}
    for seq, f, i, x, y, w, h in rows:
        d.setdefault(seq, {}).setdefault(f, {})[i] = (x, y, w, h)
    return d


def iou(a, b):
    ax1, ay1, ax2, ay2 = a[0], a[1], a[0] + a[2], a[1] + a[3]
    bx1, by1, bx2, by2 = b[0], b[1], b[0] + b[2], b[1] + b[3]
    ix = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    iy = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = ix * iy
    union = a[2] * a[3] + b[2] * b[3] - inter
    return 0.0 if union <= 0 else inter / union


def seq_metrics(gts, trks):
    frames = sorted(gts)
    gt_to_track, track_to_gt, ious = {}, {}, []
    TP = FN = 0
    for f in frames:
        g, t = gts.get(f, {}), trks.get(f, {})
        gt_to_track[f], track_to_gt[f] = {}, {}
        for gid in sorted(g):  # asc: dup-claim overwrite -> highest gid last
            best, best_tid = 0.0, None
            for tid in sorted(t):  # asc: ties keep first = lowest tid
                v = iou(g[gid], t[tid])
                if v > best:
                    best, best_tid = v, tid
            if best >= IOU_T and best_tid is not None:
                gt_to_track[f][gid] = best_tid
                track_to_gt[f][best_tid] = gid
                ious.append(best)
                TP += 1
            else:
                FN += 1
    Dets = sum(len(v) for v in trks.values())
    GT_Dets = sum(len(v) for v in gts.values())
    IDs = len({tid for v in trks.values() for tid in v})
    GT_IDs = len({gid for v in gts.values() for gid in v})
    loca = sum(ious) / len(ious) if ious else 0.0
    IDSW = Frag = 0
    last_t, last_f = {}, {}
    for f in frames:
        for gid, tid in gt_to_track.get(f, {}).items():
            if gid in last_t:
                if last_t[gid] != tid:
                    IDSW += 1
                    last_t[gid] = tid
                if int(f) > last_f[gid] + 1:
                    Frag += 1
            else:
                last_t[gid] = tid
            last_f[gid] = int(f)
    MT = PT = ML = 0
    for gid in {g for v in gts.values() for g in v}:
        tot = sum(1 for f in frames if gid in gts.get(f, {}))
        if tot == 0:
            continue
        cov = sum(1 for f in frames if gid in gt_to_track.get(f, {})) / tot
        if cov >= 0.8: MT += 1
        elif cov >= 0.2: PT += 1
        else: ML += 1
    def idtp_of(traj):
        total = 0
        for _, steps in traj.items():
            best, cur, length = {}, None, 0
            for _, other in steps:
                if other == cur:
                    length += 1
                else:
                    if cur is not None:
                        best[cur] = max(best.get(cur, 0), length)
                    cur, length = other, 1
            if cur is not None:
                best[cur] = max(best.get(cur, 0), length)
            if best:
                total += max(best.values())
        return total
    gt_traj, tr_traj = {}, {}
    for f in frames:
        for gid, tid in gt_to_track.get(f, {}).items():
            gt_traj.setdefault(gid, []).append((f, tid))
        for tid, gid in track_to_gt.get(f, {}).items():
            tr_traj.setdefault(tid, []).append((f, gid))
    IDTP = idtp_of(gt_traj)
    IDTP_tr = idtp_of(tr_traj)
    return dict(Dets=Dets, GT_Dets=GT_Dets, IDs=IDs, GT_IDs=GT_IDs,
                CLR_TP=TP, CLR_FN=FN, LocA=loca, IDSW=IDSW, Frag=Frag,
                MT=MT, PT=PT, ML=ML, IDTP=IDTP,
                IDFN=TP - IDTP, IDFP=TP - IDTP_tr)


gts, trks = by_frame(gt_rows), by_frame(tr_rows)
engine = con.execute(f"SELECT * FROM '{OUT}/m02_clear_metrics/*.parquet' ORDER BY seq").df()
ok = True
for _, row in engine.iterrows():
    exp = seq_metrics(gts[row["seq"]], trks[row["seq"]])
    for k, v in exp.items():
        got = row[k]
        if k == "LocA":
            if abs(got - v) > 2e-9:
                print(f"{row['seq']} LocA: engine={got} reference-port={v}")
                ok = False
        elif int(got) != int(v):
            print(f"{row['seq']} {k}: engine={got} reference-port={v}")
            ok = False
print("EVAL ORACLE OK: all CLEAR/Identity metrics match the reference-port"
      if ok else "EVAL ORACLE FAILED")
sys.exit(0 if ok else 1)
