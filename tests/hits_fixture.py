"""Deterministic ClickBench ``hits`` fixture at a non-trivial scale.

The reference ships the ClickBench workload verbatim
(/root/reference/benchmarks/queries/clickbench/queries.sql, 43 statements;
extended.sql, 3 more) and runs a 10-row sample of the real dataset in its
slt corpus (clickbench.slt over core/tests/data/clickbench_hits_10.parquet).
The repo already runs that 10-row file; this fixture reproduces the FULL
105-column hits schema (read from that sample parquet's footer) at 100k
rows of seeded synthetic data so the 46 statements exercise real
aggregation/filter/top-k work and can be differential-tested against
DuckDB (tests/test_clickbench_verbatim.py).

Distribution design (what makes the verbatim statements DETERMINISTIC
across engines — every `ORDER BY c DESC LIMIT k` needs a strict count
order at the cutoff, so group keys are ZIPF-skewed, not uniform):
- EventDate: uint16 days-since-epoch spanning 2013-07-01..2013-07-31
  (the date-window queries filter ``"EventDate"::INT::DATE`` on July 2013)
- EventTime: epoch seconds inside the same window (minute bucketing,
  ORDER BY to_timestamp_seconds ties broken by sparse second values)
- CounterID: 62 frequent (the PageViews queries pin it)
- UserID / SearchPhrase / URL / Title / MobilePhoneModel: zipf pools with
  '' mixtures (the <> '' filters) and 'google' substrings (LIKE filters)
- UserID magnitudes kept < 2^40 ON PURPOSE: ClickBench's real UserIDs are
  ~1e18 and a 100k-row SUM overflows int64 — Spark's sum(bigint) and
  DuckDB's hugeint sum would then legitimately diverge, which would test
  overflow POLICY, not the queries. clickbench.slt's 10-row file already
  covers the big-magnitude display path. The q19 point-lookup constant
  435090932899640449 is planted on 5 rows.
- TraficSourceID includes -1 and 6 (the IN (-1, 6) filter); RefererHash /
  URLHash plant the exact constants the point queries pin.
"""

from __future__ import annotations

import os

N_ROWS = 100_000
_SEED = 20130715


def _zipf_choice(rng, pool, n, a=1.4):
    """Zipf-ranked draw from ``pool`` — heavy skew so per-key counts are
    well separated (tie-free top-k cutoffs across engines)."""
    import numpy as np

    ranks = rng.zipf(a, size=n)
    return pool[np.minimum(ranks - 1, len(pool) - 1)]


def generate() -> str:
    """Write tests/fixtures/clickbench_hits.parquet (cached); return path."""
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "clickbench_hits.parquet"
    )
    if os.path.exists(out):
        return out
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(build_table(N_ROWS, _SEED), out)
    return out


def build_table(n: int, seed: int):
    """Build an n-row hits table with the fixture's distributions (same
    zipf pools, plants, and windows — see module docstring). Extracted so
    tools/cb_scale_probe.py can append seed-varied 1M-row chunks into a
    100× corpus without holding it all in memory."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    ref_schema = pq.read_schema(
        "/root/reference/datafusion/core/tests/data/clickbench_hits_10.parquet"
    )
    rng = np.random.default_rng(seed)

    day0 = 15887  # 2013-07-01 as days since epoch
    event_date = (day0 + rng.integers(0, 31, n)).astype("uint16")
    event_time = (
        np.int64(1372636800) + rng.integers(0, 31 * 86400, n, dtype=np.int64)
    )  # 2013-07-01T00:00:00Z + offset

    w1 = np.array([f"w{i:02d}" for i in range(40)])
    w2 = np.array([f"v{i:02d}" for i in range(40)])

    def phrases(p_empty: float) -> np.ndarray:
        s = np.char.add(
            np.char.add(_zipf_choice(rng, w1, n), " "), _zipf_choice(rng, w2, n)
        )
        return np.where(rng.random(n) < p_empty, "", s)

    hosts = np.array(
        [
            "http://example.com/page",
            "http://google.com/search",
            "http://www.google.com/maps",
            "http://news.site.org/article",
            "http://shop.example.net/item",
        ]
    )
    paths = np.array([f"/{i}" for i in range(500)])
    url = np.char.add(_zipf_choice(rng, hosts, n, 1.2), _zipf_choice(rng, paths, n))
    url = np.where(rng.random(n) < 0.05, "", url)
    referer = np.char.add(
        np.array(["http://ref.example.com/a", "https://www.google.com/q"])[
            rng.integers(0, 2, n)
        ],
        _zipf_choice(rng, np.array([f"/r{i}" for i in range(200)]), n),
    )
    referer = np.where(rng.random(n) < 0.3, "", referer)
    titles = np.array([f"Title Google {i}" for i in range(200)])
    title = np.where(rng.random(n) < 0.2, "", _zipf_choice(rng, titles, n))

    user_pool = rng.integers(0, 1 << 40, 30_000, dtype=np.int64)
    user_id = _zipf_choice(rng, user_pool, n, 1.3)
    user_id[:5] = np.int64(435090932899640449)  # q19 point lookup

    trafic = np.array([-1, 0, 1, 2, 3, 6], dtype=np.int16)[rng.integers(0, 6, n)]
    referer_hash = np.where(
        rng.random(n) < 0.01,
        np.int64(3594120000172545465),
        rng.integers(0, 1 << 40, n, dtype=np.int64),
    )
    url_hash = np.where(
        rng.random(n) < 0.01,
        np.int64(2868770270353813622),
        rng.integers(0, 1 << 40, n, dtype=np.int64),
    )

    special = {
        "WatchID": _zipf_choice(
            rng, rng.integers(0, 1 << 40, 20_000, dtype=np.int64), n, 1.3
        ),
        "Title": title,
        "EventTime": event_time,
        "EventDate": event_date,
        "CounterID": np.where(
            rng.random(n) < 0.25, 62, rng.integers(1, 200, n)
        ).astype("int32"),
        "ClientIP": _zipf_choice(
            rng, rng.integers(-(1 << 28), 1 << 28, 15_000, dtype=np.int64), n, 1.3
        ).astype("int32"),
        "RegionID": _zipf_choice(
            rng, np.arange(300, dtype=np.int64), n, 1.2
        ).astype("int32"),
        "UserID": user_id,
        "URL": url,
        "Referer": referer,
        "IsRefresh": (rng.random(n) < 0.1).astype("int16"),
        "ResolutionWidth": rng.integers(320, 3840, n).astype("int16"),
        # zipf, not uniform: a uniform phone/engine id would split each
        # model's / phrase's counts ~evenly across ids and tie the
        # (id, text) top-k cutoffs (q11/q14 ORDER BY u DESC LIMIT 10)
        "MobilePhone": _zipf_choice(
            rng, np.arange(6, dtype=np.int64), n, 1.6
        ).astype("int16"),
        "MobilePhoneModel": phrases(0.7),
        "TraficSourceID": trafic,
        "SearchEngineID": _zipf_choice(
            rng, np.arange(4, dtype=np.int64), n, 1.6
        ).astype("int16"),
        "SearchPhrase": phrases(0.6),
        "AdvEngineID": np.where(rng.random(n) < 0.9, 0, rng.integers(1, 5, n)).astype(
            "int16"
        ),
        "WindowClientWidth": rng.integers(320, 3840, n).astype("int16"),
        "WindowClientHeight": rng.integers(240, 2160, n).astype("int16"),
        "IsLink": (rng.random(n) < 0.2).astype("int16"),
        "IsDownload": (rng.random(n) < 0.05).astype("int16"),
        "DontCountHits": (rng.random(n) < 0.1).astype("int16"),
        "RefererHash": referer_hash,
        "URLHash": url_hash,
        "HitColor": np.array(["W", "G", "K", ""])[rng.integers(0, 4, n)],
        "BrowserLanguage": np.array(["en", "de", "fr", "ru"])[rng.integers(0, 4, n)],
        "BrowserCountry": np.array(["US", "DE", "FR", "RU", ""])[
            rng.integers(0, 5, n)
        ],
        "SocialNetwork": np.array(["", "fb", "tw", "vk"])[rng.integers(0, 4, n)],
        "SocialAction": np.array(["", "like", "share"])[rng.integers(0, 3, n)],
    }

    arrays, names = [], []
    for f in ref_schema:
        names.append(f.name)
        if f.name in special:
            arr = pa.array(special[f.name]).cast(f.type)
        elif pa.types.is_string(f.type):
            arr = pa.array(np.full(n, "", dtype=object), type=pa.string())
        else:
            arr = pa.array(
                rng.integers(0, 100, n, dtype=np.int64), type=pa.int64()
            ).cast(f.type)
        arrays.append(arr)
    return pa.Table.from_arrays(arrays, names=names)


if __name__ == "__main__":
    print(generate())
