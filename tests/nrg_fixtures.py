"""Reference-shaped synthetic input generator (FIXTURES.md §B).

Deterministic (seeded) gzipped CSVs in the exact shape the reference
consumed: EIA-930 balancing-authority header CSV (raw headers with spaces
and parens), GHCN-Daily headerless CSV, and the locations dimension. A
``corrupt`` switch injects exactly-counted violations of each QC property
so tests can assert both the pass and fail paths.
"""

from __future__ import annotations

import csv
import gzip
import random
from pathlib import Path

BA_CODES = ["PJM", "MISO", "CISO", "ERCO"]
STATIONS = [f"USW{i:08d}" for i in range(8)]
UNKNOWN_STATION = "USW99999999"  # in weather but not in locations
ORPHAN_STATION = "USW88888888"   # in locations but no weather rows
NULL_ACRONYM_STATION = STATIONS[7]  # mapped, but with empty Acronym (J1 NULL edge)

FUEL_HEADERS = [
    "Net Generation (MW) from Coal",
    "Net Generation (MW) from Natural Gas",
    "Net Generation (MW) from Nuclear",
    "Net Generation (MW) from All Petroleum Products",
    "Net Generation (MW) from Hydropower and Pumped Storage",
    "Net Generation (MW) from Solar",
    "Net Generation (MW) from Wind",
    "Net Generation (MW) from Other Fuel Sources",
    "Net Generation (MW) from Unknown Fuel Sources",
]

BA_HEADERS = [
    "Balancing Authority",
    "Region",
    "Local Time at End of Hour",
    "UTC Time at End of Hour",
    "Data Date",
    "Demand Forecast (MW)",
    "Demand (MW) (Adjusted)",
    "Net Generation (MW) (Adjusted)",
    *FUEL_HEADERS,
]

WEATHER_PARAMS = ["TMIN", "TMAX", "TAVG", "SNOW", "SNWD", "PRCP", "AWND"]  # AWND dropped by pivot


def write_bal_auth_csv(path: Path, n_days: int = 3, corrupt: bool = False, seed: int = 42) -> int:
    """Hourly BA rows; total = sum of fuel parts except seeded violations."""
    rng = random.Random(seed)
    n_bad = 0
    with gzip.open(path, "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(BA_HEADERS)
        for ba in BA_CODES:
            for day in range(1, n_days + 1):
                for hour in range(24):
                    h12 = hour % 12 or 12
                    ampm = "AM" if hour < 12 else "PM"
                    local = f"01/{day:02d}/2024 {h12:02d}:00:00 {ampm}"
                    utc = f"01/{day:02d}/2024 {hour:02d}:00"
                    data_date = f"01/{day:02d}/2024"
                    parts = [rng.randint(0, 500) for _ in FUEL_HEADERS]
                    total = sum(parts)
                    if corrupt and hour == 0:
                        total += 17  # consistency violation, one per BA-day
                        n_bad += 1
                    w.writerow(
                        [ba, "TestRegion", local, utc, data_date,
                         rng.randint(500, 5000), rng.randint(500, 5000), total, *parts]
                    )
    return n_bad


def write_weather_csv(path: Path, n_days: int = 3, corrupt: bool = False, seed: int = 43) -> None:
    """One row per (station, date, parameter); duplicate (station, date,
    parameter) rows are seeded to exercise pivot MAX; UNKNOWN_STATION rows
    must be dropped by the semi-join; corrupt mode drops TMIN rows."""
    rng = random.Random(seed)
    with gzip.open(path, "wt", newline="") as f:
        w = csv.writer(f)
        for station in [*STATIONS, UNKNOWN_STATION]:
            for day in range(1, n_days + 1):
                date = f"202401{day:02d}"
                for param in WEATHER_PARAMS:
                    if corrupt and param == "TMIN" and station == STATIONS[0]:
                        continue  # null TMIN after pivot
                    value = rng.randint(-100, 300)
                    w.writerow([station, date, param, value, "", "", "S", "0700"])
                    if param == "TMAX":  # duplicate → pivot takes MAX
                        w.writerow([station, date, param, value - 50, "", "", "S", "0700"])


def write_locations_csv(path: Path) -> None:
    with path.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Stations", "Acronym"])
        for i, station in enumerate(STATIONS):
            acronym = "" if station == NULL_ACRONYM_STATION else BA_CODES[i % len(BA_CODES)]
            w.writerow([station, acronym])
        w.writerow([ORPHAN_STATION, "ORPH"])


def generate_all(root: Path, corrupt: bool = False) -> dict[str, str]:
    root.mkdir(parents=True, exist_ok=True)
    ba = root / "bal_auth.csv.gz"
    weather = root / "weather.csv.gz"
    locations = root / "locations.csv"
    write_bal_auth_csv(ba, corrupt=corrupt)
    write_weather_csv(weather, corrupt=corrupt)
    write_locations_csv(locations)
    return {"bal_auth": str(ba), "weather": str(weather), "locations": str(locations)}
