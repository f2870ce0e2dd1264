#!/usr/bin/env python3
"""Independent oracle for the suppression kernels: reference-faithful
_nms and _remove_nested_detections (reference src/detection.py:
1120-1261) compared against the Scala kernels.

Usage:
  python3 tools/nms_oracle.py gen
  python3 tools/nms_oracle.py check   # after `sbt "runMain graft.NmsOracleRunner"`
"""
import sys

FIX = "/tmp/nms_fixture"
NMS_T = 0.5


def gen():
    import os
    os.makedirs(FIX, exist_ok=True)
    rows = []
    for f in range(12):  # frames
        for i in range(60):  # clustered, overlapping boxes
            x1 = (i % 8) * 55 + (f * 3 + i) % 13
            y1 = (i % 6) * 60 + (f + 2 * i) % 11
            x2 = x1 + 35 + (i % 9) * 7
            y2 = y1 + 30 + ((i + f) % 7) * 8
            score = round(0.05 + ((i * 17 + f * 29) % 90) / 100.0, 2)
            rows.append((f, i, float(x1), float(y1), float(x2), float(y2), score))
    with open(f"{FIX}/boxes.csv", "w") as fh:
        for r in rows:
            fh.write(",".join(str(v) for v in r) + "\n")
    print(f"{len(rows)} boxes")


def iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    union = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return 0.0 if union <= 0 else inter / union


def ratio(first, second):
    # reference: intersection / area of FIRST argument (detection.py:1295)
    ix = max(0.0, min(first[2], second[2]) - max(first[0], second[0]))
    iy = max(0.0, min(first[3], second[3]) - max(first[1], second[1]))
    if ix <= 0 or iy <= 0:
        return 0.0
    area = (first[2] - first[0]) * (first[3] - first[1])
    return 0.0 if area == 0 else ix * iy / area


def nms(dets):
    dets = sorted(dets, key=lambda d: (-d["score"], d["id"]))
    keep = []
    while dets:
        best = dets.pop(0)
        keep.append(best)
        dets = [d for d in dets if iou(best["box"], d["box"]) < NMS_T]
    return keep


def remove_nested(dets):
    dets = sorted(dets, key=lambda d: (-d["score"], d["id"]))
    keep = []
    for cur in dets:
        cur_hi = cur["score"] > NMS_T
        ok = True
        rm = []
        for i, kd in enumerate(keep):
            kd_hi = kd["score"] > NMS_T
            cur_in_kept = ratio(cur["box"], kd["box"])
            kept_in_cur = ratio(kd["box"], cur["box"])
            if cur_in_kept >= NMS_T:
                if kd_hi: ok = False; break
                elif cur_hi: rm.append(i)
                else: ok = False; break
            elif kept_in_cur >= NMS_T:
                if cur_hi: rm.append(i)
                elif kd_hi: ok = False; break
                else: ok = False; break
        for i in sorted(rm, reverse=True):
            keep.pop(i)
        if ok:
            keep.append(cur)
    return keep


def check():
    frames = {}
    for line in open(f"{FIX}/boxes.csv"):
        p = line.strip().split(",")
        frames.setdefault(int(p[0]), []).append(
            {"id": int(p[1]), "box": [float(p[2]), float(p[3]), float(p[4]), float(p[5])],
             "score": float(p[6])})
    exp_nms, exp_nested = [], []
    for f in sorted(frames):
        exp_nms += [(f, d["id"]) for d in nms(frames[f])]
        exp_nested += [(f, d["id"]) for d in remove_nested(frames[f])]
    got_nms = sorted(tuple(map(int, l.strip().split(","))) for l in open(f"{FIX}/scala_nms.csv"))
    got_nested = sorted(tuple(map(int, l.strip().split(","))) for l in open(f"{FIX}/scala_nested.csv"))
    ok = True
    if sorted(exp_nms) != got_nms:
        print(f"NMS MISMATCH: py={len(exp_nms)} scala={len(got_nms)}")
        print(set(exp_nms) ^ set(got_nms))
        ok = False
    if sorted(exp_nested) != got_nested:
        print(f"NESTED MISMATCH: py={len(exp_nested)} scala={len(got_nested)}")
        print(set(exp_nested) ^ set(got_nested))
        ok = False
    if ok:
        print(f"NMS ORACLE OK: nms={len(got_nms)} nested={len(got_nested)} kept rows identical")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    gen() if sys.argv[1] == "gen" else check()
