#!/usr/bin/env python3
"""Independent oracle for the tracker kernel: re-implements the
reference tracker's per-frame semantics (predict -> index -> match ->
update -> delete -> create -> emit; reference src/tracking.py) in
numpy, generates a deterministic fixture, and compares against the
Scala kernel's output (produced by `sbt "runMain graft.TrackOracle"`).

Usage:
  python3 tools/tracker_oracle.py gen   # write fixture to /tmp/trk_fixture
  python3 tools/tracker_oracle.py check # compare /tmp/trk_fixture/scala_out.csv
"""
import json, math, os, sys
import numpy as np

FIX = "/tmp/trk_fixture"

# reference defaults (cfgs/track.yaml)
TH_APP, TH_DIST, TH_SIZE, TOL = 0.4764, 99.18, 0.3143, 0.3
W_APP, W_EUCL, W_KAL, W_SIZE = 0.2, 0.2, 0.5, 0.1
MAX_AGE, MIN_LEN, MIN_SIZE = 3, 1, 0.0
PROC_N, MEAS_N = 10.0, 18.0
CELL = 100.0
EMB_DIM = 16


def gen_fixture():
    os.makedirs(FIX, exist_ok=True)
    rows, embs = [], {}
    n_obj, n_frames = 12, 40
    base = {o: np.array([((o * 37) % 7) - 3.0, ((o * 53) % 7) - 3.0]) for o in range(n_obj)}
    for f in range(1, n_frames + 1):
        det_id = 0
        for o in range(n_obj):
            if (f + o) % 7 == 0:
                continue  # missed detection
            if o == 11 and 10 <= f <= 15:
                continue  # long dropout: gap 6 > max_age -> death + new id
            if o == 10 and f % 2 == 0:
                continue  # flickering object: repeated 1-frame gaps
            x = 60.0 + (o % 4) * 180 + base[o][0] * f + ((f * o) % 5)
            y = 60.0 + (o // 4) * 180 + base[o][1] * f + ((f + o) % 4)
            w = 28.0 + (o % 5) * 3 + (f % 3)
            h = 26.0 + (o % 4) * 4 + ((f + o) % 3)
            conf = 0.5 + ((f * 7 + o * 13) % 50) / 100.0
            rows.append((f"{f:06d}", det_id, x, y, w, h, conf))
            # embedding: per-object signature + small per-frame wobble
            v = np.zeros(EMB_DIM, dtype=np.float32)
            for k in range(EMB_DIM):
                v[k] = math.sin(o * 2.3 + k) + 0.01 * math.sin(f * 1.7 + k * 0.9)
            embs[f"{f:06d}_{det_id}"] = v
            det_id += 1
        if f % 9 == 0:  # spurious one-frame detection, unique appearance
            x, y = 700.0 + (f % 3) * 17, 700.0 + (f % 5) * 13
            rows.append((f"{f:06d}", det_id, x, y, 30.0, 30.0, 0.95))
            v = np.zeros(EMB_DIM, dtype=np.float32)
            for k in range(EMB_DIM):
                v[k] = math.cos(f * 3.1 + k * 1.3)
            embs[f"{f:06d}_{det_id}"] = v
            det_id += 1
    with open(f"{FIX}/det.csv", "w") as fh:
        for r in rows:
            fh.write(",".join(str(v) for v in r) + "\n")
    with open(f"{FIX}/embs.json", "w") as fh:
        json.dump({k: [float(x) for x in v] for k, v in embs.items()}, fh)
    print(f"fixture: {len(rows)} detections, {len(embs)} embeddings")


# --- reference-faithful tracker ------------------------------------------
F_MAT = np.array([[1,0,1,0,0,0],[0,1,0,1,0,0],[0,0,1,0,0,0],
                  [0,0,0,1,0,0],[0,0,0,0,1,0],[0,0,0,0,0,1]], float)
H_MAT = np.array([[1,0,0,0,0,0],[0,1,0,0,0,0],[0,0,0,0,1,0],[0,0,0,0,0,1]], float)
Q_MAT = np.diag([PROC_N] * 6)
R_MAT = np.diag([MEAS_N] * 4)


class Trk:
    _next = [1]
    def __init__(self, det, frame_id):
        self.track_id = Trk._next[0]; Trk._next[0] += 1
        self.hits = 1; self.age = 1; self.tsu = 0
        self.last_bbox = det["bbox"]; self.last = det
        x, y, w, h = det["bbox"]
        self.kx = np.array([x, y, 0, 0, w, h], float)
        self.kp = np.eye(6) * 100.0
        self.pred = det["bbox"]
        self.emb_key = det["emb_key"]

    def predict(self):
        self.kx = F_MAT @ self.kx
        self.kp = F_MAT @ self.kp @ F_MAT.T + Q_MAT
        self.pred = [self.kx[0], self.kx[1], self.kx[4], self.kx[5]]
        self.age += 1; self.tsu += 1

    def update(self, det, frame_id):
        z = np.array(det["bbox"], float)
        S = H_MAT @ self.kp @ H_MAT.T + R_MAT
        K = self.kp @ H_MAT.T @ np.linalg.inv(S)
        self.kx = self.kx + K @ (z - H_MAT @ self.kx)
        I_KH = np.eye(6) - K @ H_MAT
        self.kp = I_KH @ self.kp @ I_KH.T + K @ R_MAT @ K.T
        self.last_bbox = det["bbox"]; self.last = det
        self.hits += 1; self.tsu = 0
        self.emb_key = det["emb_key"]

    def uncertainty(self):
        return 2 * math.sqrt(self.kp[0, 0] + self.kp[1, 1])


def center(b):
    return (b[0] + b[2] / 2, b[1] + b[3] / 2)


def similarity(trk, det, ea, eb):
    a1 = trk.last_bbox[2] * trk.last_bbox[3]
    a2 = det["bbox"][2] * det["bbox"][3]
    size_sim = 0.0 if (a1 == 0 or a2 == 0) else min(a1, a2) / max(a1, a2)
    if size_sim < TH_SIZE * (1 - TOL):
        return None
    na = float(np.dot(ea.astype(np.float64), ea.astype(np.float64)))
    nb = float(np.dot(eb.astype(np.float64), eb.astype(np.float64)))
    dot = float(np.dot(ea.astype(np.float64), eb.astype(np.float64)))
    app = 0.5 if (na == 0 or nb == 0) else (dot / (math.sqrt(na) * math.sqrt(nb)) + 1) / 2
    if app < TH_APP * (1 - TOL):
        return None
    cx1, cy1 = center(trk.last_bbox); cx2, cy2 = center(det["bbox"])
    d_eucl = math.sqrt((cx1 - cx2) ** 2 + (cy1 - cy2) ** 2)
    px, py = center(trk.pred)
    d_kal = math.sqrt((px - cx2) ** 2 + (py - cy2) ** 2)
    kal_n = 1 - (d_kal - 0) / (TH_DIST - 0)
    eucl_n = 1 - (d_eucl - 0) / (TH_DIST - 0)
    size_n = (size_sim - TH_SIZE) / (1.0 - TH_SIZE)
    app_n = (app - TH_APP) / (1.0 - TH_APP)
    return (app_n * W_APP + eucl_n * W_EUCL + kal_n * W_KAL + size_n * W_SIZE) / \
        (W_APP + W_EUCL + W_KAL + W_SIZE)


def track(dets_by_frame, embs, bidirectional=True):
    Trk._next[0] = 1
    tracks, results = [], []
    for frame_id in sorted(dets_by_frame):
        dets = dets_by_frame[frame_id]
        for t in tracks:
            t.predict()
        grid = {}
        for d in dets:
            cx, cy = center(d["bbox"])
            grid.setdefault((int(cx // CELL), int(cy // CELL)), []).append(d)
        def candidates(t):
            radius = max(t.uncertainty(), TH_DIST * (1 + TOL))
            px, py = center(t.pred)
            rc = int(math.ceil(radius / CELL))
            ccx, ccy = int(px // CELL), int(py // CELL)
            out = []
            for dx in range(-rc, rc + 1):
                for dy in range(-rc, rc + 1):
                    for d in grid.get((ccx + dx, ccy + dy), []):
                        dcx, dcy = center(d["bbox"])
                        if math.sqrt((dcx - px) ** 2 + (dcy - py) ** 2) <= radius:
                            out.append(d)
            return out
        matches, m_trk, m_det = [], set(), set()
        if bidirectional:
            track_best, det_best = {}, {}
            for t in tracks:
                best, best_sim = None, 0.0
                for d in candidates(t):
                    ea = embs.get(t.emb_key); eb = embs.get(d["emb_key"])
                    if ea is None or eb is None:
                        continue
                    sim = similarity(t, d, ea, eb)
                    if sim is not None and sim > best_sim:
                        best_sim, best = sim, d
                if best is not None:
                    track_best[t] = (best, best_sim)
                    cur = det_best.get(best["id"])
                    if cur is None or best_sim > cur[1]:
                        det_best[best["id"]] = (t, best_sim)
            for t, (d, s) in track_best.items():
                if det_best.get(d["id"], (None,))[0] is t:
                    matches.append((t, d)); m_trk.add(t.track_id); m_det.add(d["id"])
        else:
            cands = []
            for t in tracks:
                for d in candidates(t):
                    ea = embs.get(t.emb_key); eb = embs.get(d["emb_key"])
                    if ea is None or eb is None:
                        continue
                    sim = similarity(t, d, ea, eb)
                    if sim is not None:
                        cands.append((sim, t, d))
            cands.sort(key=lambda c: c[0], reverse=True)  # stable, sim only
            for sim, t, d in cands:
                if t.track_id in m_trk or d["id"] in m_det:
                    continue
                matches.append((t, d)); m_trk.add(t.track_id); m_det.add(d["id"])
        for t, d in matches:
            t.update(d, frame_id)
        tracks = [t for t in tracks
                  if t.track_id in m_trk or t.tsu <= MAX_AGE]
        for d in dets:
            if d["id"] not in m_det and d["bbox"][2] * d["bbox"][3] >= MIN_SIZE:
                tracks.append(Trk(d, frame_id))
        for t in tracks:
            if t.tsu == 0:
                results.append((frame_id, t.track_id, *t.last_bbox, t.last["conf"]))
    # min-length filter
    from collections import Counter
    lens = Counter(r[1] for r in results)
    return [r for r in results if lens[r[1]] >= MIN_LEN]


def check(bidirectional=True, scala_file="scala_out.csv"):
    dets_by_frame, embs = {}, {}
    for line in open(f"{FIX}/det.csv"):
        p = line.strip().split(",")
        d = {"id": int(p[1]), "bbox": [float(p[2]), float(p[3]), float(p[4]), float(p[5])],
             "conf": float(p[6]), "emb_key": f"{p[0]}_{p[1]}"}
        dets_by_frame.setdefault(p[0], []).append(d)
    for k, v in json.load(open(f"{FIX}/embs.json")).items():
        embs[k] = np.array(v, dtype=np.float32)
    expected = track(dets_by_frame, embs, bidirectional)
    got = []
    for line in open(f"{FIX}/{scala_file}"):
        p = line.strip().split(",")
        got.append((p[0], int(p[1]), float(p[2]), float(p[3]), float(p[4]),
                    float(p[5]), float(p[6])))
    exp_sorted = sorted(expected, key=lambda r: (r[0], r[1]))
    got_sorted = sorted(got, key=lambda r: (r[0], r[1]))
    if len(exp_sorted) != len(got_sorted):
        print(f"ROW MISMATCH: python={len(exp_sorted)} scala={len(got_sorted)}")
        sys.exit(1)
    bad = 0
    for e, g in zip(exp_sorted, got_sorted):
        if e[0] != g[0] or e[1] != g[1]:
            print(f"ID MISMATCH: {e} vs {g}"); bad += 1
        elif any(abs(a - b) > 1e-6 for a, b in zip(e[2:], g[2:])):
            print(f"VALUE MISMATCH: {e} vs {g}"); bad += 1
        if bad > 5:
            break
    if bad:
        sys.exit(1)
    print(f"TRACKER ORACLE OK: {len(got_sorted)} rows identical "
          f"({len(set(r[1] for r in got_sorted))} tracks)")


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen_fixture()
    elif sys.argv[1] == "check":
        check()
    else:  # check_greedy
        check(bidirectional=False, scala_file="scala_out_greedy.csv")
