"""Reference-semantics DeepSORT oracle (NumPy + scipy, test-only).

Independent reimplementation of the runnable reference tracker
(/root/reference/deep_sort/deep_sort/{tracker,track,kalman_filter,
linear_assignment,iou_matching,nn_matching}.py) used as the parity
oracle for the scan tracker: same Kalman formulas, gated cosine
matching cascade over time_since_update levels, IoU stage, lifecycle
(tentative -> confirmed after n_init hits; tentative miss or
time_since_update > max_age -> deleted), per-id feature gallery with a
most-recent `budget` window, and the result-row condition
(confirmed & time_since_update <= 1).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment

INFTY_COST = 1e5
CHI2INV95_4DOF = 9.4877

_WP = 1.0 / 20
_WV = 1.0 / 160
_F = np.eye(8) + np.eye(8, k=4)
_H = np.eye(4, 8)


def to_xyah(tlwh):
    t = np.asarray(tlwh, np.float64)
    return np.array(
        [t[0] + t[2] / 2, t[1] + t[3] / 2, t[2] / max(t[3], 1e-6), t[3]]
    )


def to_tlwh(xyah):
    x, y, a, h = xyah
    w = a * h
    return np.array([x - w / 2, y - h / 2, w, h])


class _KF:
    def initiate(self, meas):
        mean = np.concatenate([meas, np.zeros(4)])
        h = meas[3]
        std = np.array([
            2 * _WP * h, 2 * _WP * h, 1e-2, 2 * _WP * h,
            10 * _WV * h, 10 * _WV * h, 1e-5, 10 * _WV * h,
        ])
        return mean, np.diag(std**2)

    def predict(self, mean, cov):
        h = mean[3]
        std = np.array([
            _WP * h, _WP * h, 1e-2, _WP * h,
            _WV * h, _WV * h, 1e-5, _WV * h,
        ])
        q = np.diag(std**2)
        return _F @ mean, _F @ cov @ _F.T + q

    def project(self, mean, cov):
        h = mean[3]
        std = np.array([_WP * h, _WP * h, 1e-1, _WP * h])
        r = np.diag(std**2)
        return _H @ mean, _H @ cov @ _H.T + r

    def update(self, mean, cov, meas):
        pm, pc = self.project(mean, cov)
        gain = np.linalg.solve(pc.T, (cov @ _H.T).T).T  # (8, 4)
        new_mean = mean + gain @ (meas - pm)
        new_cov = cov - gain @ pc @ gain.T
        return new_mean, new_cov

    def gating_distance(self, mean, cov, measurements):
        pm, pc = self.project(mean, cov)
        chol = np.linalg.cholesky(pc)
        d = np.asarray(measurements) - pm
        z = np.linalg.solve(chol, d.T)  # (4, D)
        return np.sum(z * z, axis=0)


class _Track:
    TENTATIVE, CONFIRMED, DELETED = 1, 2, 3

    def __init__(self, mean, cov, track_id, n_init, max_age, feature):
        self.mean, self.cov = mean, cov
        self.track_id = track_id
        self.hits = 1
        self.time_since_update = 0
        self.state = self.TENTATIVE
        self.features = [feature]
        self._n_init, self._max_age = n_init, max_age

    def predict(self, kf):
        self.mean, self.cov = kf.predict(self.mean, self.cov)
        self.time_since_update += 1

    def update(self, kf, tlwh, feature):
        self.mean, self.cov = kf.update(self.mean, self.cov, to_xyah(tlwh))
        self.features.append(feature)
        self.hits += 1
        self.time_since_update = 0
        if self.state == self.TENTATIVE and self.hits >= self._n_init:
            self.state = self.CONFIRMED

    def mark_missed(self):
        if self.state == self.TENTATIVE:
            self.state = self.DELETED
        elif self.time_since_update > self._max_age:
            self.state = self.DELETED


def _min_cost_matching(cost_fn, max_distance, track_idx, det_idx):
    """(matches, unmatched_tracks, unmatched_dets) with capped costs
    (linear_assignment.py:57-76 semantics)."""
    if len(det_idx) == 0 or len(track_idx) == 0:
        return [], list(track_idx), list(det_idx)
    cost = cost_fn(track_idx, det_idx)
    cost = np.where(cost > max_distance, max_distance + 1e-5, cost)
    rows, cols = linear_sum_assignment(cost)
    matches, un_t, un_d = [], [], []
    for c, di in enumerate(det_idx):
        if c not in cols:
            un_d.append(di)
    for r, ti in enumerate(track_idx):
        if r not in rows:
            un_t.append(ti)
    for r, c in zip(rows, cols):
        if cost[r, c] > max_distance:
            un_t.append(track_idx[r])
            un_d.append(det_idx[c])
        else:
            matches.append((track_idx[r], det_idx[c]))
    return matches, un_t, un_d


class OracleDeepSort:
    """Whole-tracker oracle; step() consumes one frame."""

    def __init__(self, max_iou_distance=0.7, max_age=30, n_init=3,
                 matching_threshold=0.2, budget=16):
        self.kf = _KF()
        self.tracks = []
        self.next_id = 1
        self.max_iou_distance = max_iou_distance
        self.max_age = max_age
        self.n_init = n_init
        self.matching_threshold = matching_threshold
        self.budget = budget
        self.gallery = {}  # track_id -> list of normalized features

    # --- costs ---
    def _appearance_cost(self, track_idx, det_feats, det_tlwh, det_idx):
        def norm(x):
            return x / max(np.linalg.norm(x), 1e-12)

        cost = np.zeros((len(track_idx), len(det_idx)))
        for r, ti in enumerate(track_idx):
            tr = self.tracks[ti]
            gal = np.asarray(self.gallery.get(tr.track_id, []))
            for c, di in enumerate(det_idx):
                f = norm(det_feats[di])
                if gal.size == 0:
                    cost[r, c] = INFTY_COST
                else:
                    cost[r, c] = 1.0 - np.max(gal @ f)
            # Mahalanobis gate
            meas = np.stack([to_xyah(det_tlwh[di]) for di in det_idx])
            maha = self.kf.gating_distance(tr.mean, tr.cov, meas)
            cost[r, maha > CHI2INV95_4DOF] = INFTY_COST
        return cost

    def _iou_cost(self, track_idx, det_tlwh, det_idx):
        cost = np.zeros((len(track_idx), len(det_idx)))
        for r, ti in enumerate(track_idx):
            tr = self.tracks[ti]
            if tr.time_since_update > 1:
                cost[r, :] = INFTY_COST
                continue
            t = to_tlwh(tr.mean[:4])
            for c, di in enumerate(det_idx):
                d = det_tlwh[di]
                lo = np.maximum(t[:2], d[:2])
                hi = np.minimum(t[:2] + t[2:], d[:2] + d[2:])
                wh = np.clip(hi - lo, 0, None)
                inter = wh[0] * wh[1]
                union = t[2] * t[3] + d[2] * d[3] - inter
                cost[r, c] = 1.0 - inter / max(union, 1e-9)
        return cost

    # --- one frame ---
    def step(self, det_tlwh, det_feats, det_mask):
        det_tlwh = np.asarray(det_tlwh, np.float64)
        det_feats = np.asarray(det_feats, np.float64)
        dets = [i for i in range(len(det_tlwh)) if det_mask[i]]

        for t in self.tracks:
            t.predict(self.kf)

        confirmed = [i for i, t in enumerate(self.tracks)
                     if t.state == _Track.CONFIRMED]
        unconfirmed = [i for i, t in enumerate(self.tracks)
                       if t.state != _Track.CONFIRMED]

        # matching cascade over time_since_update levels
        matches = []
        un_d = list(dets)
        for level in range(self.max_age):
            if not un_d:
                break
            level_tracks = [
                k for k in confirmed
                if self.tracks[k].time_since_update == 1 + level
            ]
            if not level_tracks:
                continue
            m, _, un_d = _min_cost_matching(
                lambda ti, di: self._appearance_cost(ti, det_feats, det_tlwh, di),
                self.matching_threshold, level_tracks, un_d,
            )
            matches += m
        un_t_a = [k for k in confirmed if k not in {m[0] for m in matches}]

        iou_candidates = unconfirmed + [
            k for k in un_t_a if self.tracks[k].time_since_update == 1
        ]
        un_t_a = [k for k in un_t_a if self.tracks[k].time_since_update != 1]
        m_b, un_t_b, un_d = _min_cost_matching(
            lambda ti, di: self._iou_cost(ti, det_tlwh, di),
            self.max_iou_distance, iou_candidates, un_d,
        )
        matches += m_b
        unmatched_tracks = set(un_t_a) | set(un_t_b)

        for ti, di in matches:
            self.tracks[ti].update(self.kf, det_tlwh[di], det_feats[di])
        for ti in unmatched_tracks:
            self.tracks[ti].mark_missed()
        for di in un_d:
            mean, cov = self.kf.initiate(to_xyah(det_tlwh[di]))
            self.tracks.append(_Track(
                mean, cov, self.next_id, self.n_init, self.max_age,
                det_feats[di],
            ))
            self.next_id += 1
        self.tracks = [t for t in self.tracks if t.state != _Track.DELETED]

        # gallery update (nn_matching.partial_fit with budget)
        for t in self.tracks:
            if t.state != _Track.CONFIRMED:
                continue
            gal = self.gallery.setdefault(t.track_id, [])
            for f in t.features:
                gal.append(np.asarray(f) / max(np.linalg.norm(f), 1e-12))
            t.features = []
            self.gallery[t.track_id] = gal[-self.budget:]
        live_ids = {t.track_id for t in self.tracks}
        self.gallery = {k: v for k, v in self.gallery.items() if k in live_ids}

        # result rows: confirmed & updated at most one frame ago
        rows = []
        for t in self.tracks:
            if t.state == _Track.CONFIRMED and t.time_since_update <= 1:
                rows.append((t.track_id, to_tlwh(t.mean[:4])))
        return rows
