"""Generate the ``--data test`` smoke fixture (``data/brightkite.txt``).

The reference's ``--data test`` branch (utils.py:74-77) reads the first
10k rows of a brightkite check-in dump that is not fetchable in a
zero-egress environment. This writes a SYNTHETIC file with the same
5-column layout (uid, timestamp, lat, lng, iid) and realistic check-in
statistics (power-law venue popularity, repeat visits, per-user home
regions) so the smoke path — ``acf-tpu --data test`` with the default
``data/`` root — works out of the box. Deterministic (seed 0); re-run this
script to regenerate.
"""

import os

import numpy as np


def main(path="data/brightkite.txt", n_users=400, n_venues=900,
         n_rows=12000, seed=0):
    rng = np.random.default_rng(seed)
    # power-law venue popularity
    pop = rng.zipf(1.5, size=n_venues * 4) % n_venues
    home = rng.uniform(-60, 60, size=(n_users, 2))
    rows = []
    t0 = 1_200_000_000
    checkins = rng.multinomial(n_rows - n_users,
                               np.full(n_users, 1.0 / n_users)) + 1
    for u, k in enumerate(checkins):
        # each user mixes personal favorites with globally popular venues
        favs = rng.choice(n_venues, size=8, replace=False)
        vs = np.where(rng.random(k) < 0.6, rng.choice(favs, size=k),
                      rng.choice(pop, size=k))
        ts = np.sort(t0 + rng.integers(0, 90 * 86400, size=k))
        lat = home[u, 0] + rng.normal(0, 0.05, size=k)
        lng = home[u, 1] + rng.normal(0, 0.05, size=k)
        for v, t, la, ln in zip(vs, ts, lat, lng):
            rows.append((u, int(t), la, ln, f"v{v:05d}"))
    rows.sort(key=lambda r: r[1])  # global chronological interleave
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for u, t, la, ln, v in rows:
            f.write(f"{u}\t{t}\t{la:.6f}\t{ln:.6f}\t{v}\n")
    print(f"wrote {len(rows)} rows to {path}")


if __name__ == "__main__":
    main()
