"""Seeded JDE fixture generator — the rebuild's equivalent of the
reference's ``src/python/generate_jde_data.py`` (seeds 42, 50 customers
/ 200 orders), extended with the edge rows FIXTURES.md §1 requires and
the reference never generates: century-0 Julian dates, leap-day DDD=366,
``SDUORG = 0`` (safe-divide), NULL business attributes (hash
null-normalization).

Plain Python/CSV on purpose: fixtures are landing-zone inputs; the
engine under test must do all decoding.
"""

from __future__ import annotations

import csv
import datetime as dt
import os
import random


def date_to_julian(d: dt.date) -> int:
    """CYYDDD encode (generate_jde_data.py:28-42)."""
    century = d.year // 100 - 19
    return century * 100000 + (d.year % 100) * 1000 + d.timetuple().tm_yday


def generate_landing(
    root: str,
    n_customers: int = 50,
    n_orders: int = 200,
    seed: int = 42,
) -> dict[str, int]:
    rng = random.Random(seed)
    landing = os.path.join(root, "landing")
    os.makedirs(landing, exist_ok=True)

    customer_ids = rng.sample(range(10000, 100000), n_customers)
    base = dt.date(2023, 1, 1)

    f0101 = []
    for i, cid in enumerate(customer_ids):
        upd = base + dt.timedelta(days=rng.randrange(0, 730))
        name: str | None = f"Company {cid}"
        cat: str | None = rng.choice(["100", "200", "300"])
        if i == 0:
            name = None  # NULL attribute → hash null-normalization path
        f0101.append(
            {
                "ABAN8": cid,
                "ABALPH": name,
                "ABAT1": "C",
                "ABAC01": cat,
                "ABUPMJ": date_to_julian(upd),
            }
        )

    order_ids = rng.sample(range(1, 1_000_001), n_orders)
    f4211 = []
    for i, oid in enumerate(order_ids):
        odate = base + dt.timedelta(days=rng.randrange(0, 365))
        units = rng.randrange(1, 101)
        unit_price = rng.randrange(1000, 50001)  # cents: $10–$500
        row = {
            "SDDOCO": oid,
            "SDDCTO": "SO",
            "SDAN8": rng.choice(customer_ids),
            "SDLITM": f"{rng.randrange(10**12, 10**13)}",
            "SDTRDJ": date_to_julian(odate),
            "SDUORG": units * 100,
            "SDAEXP": units * unit_price,
        }
        if i == 0:
            row["SDTRDJ"] = date_to_julian(dt.date(1999, 7, 4))  # century 0
        elif i == 1:
            row["SDTRDJ"] = date_to_julian(dt.date(2024, 12, 31))  # DDD=366
        elif i == 2:
            row["SDUORG"] = 0  # safe-divide edge
        f4211.append(row)

    for name, rows in [("F0101.csv", f0101), ("F4211.csv", f4211)]:
        with open(os.path.join(landing, name), "w", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)

    return {"F0101": len(f0101), "F4211": len(f4211)}
