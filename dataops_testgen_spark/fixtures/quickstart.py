"""Quick-start demo dataset: a small retail star schema with deliberately
seeded data-quality flaws.

Parity target: the reference's quick-start fixture
(`/root/reference/testgen/template/quick_start/recreate_target_data_schema
.sql` + `populate_target_data.sql`) seeds an e-bike catalog whose flaws are
the point — inconsistent category casing ('E-bike'/'EBIKE'/'Ebike'/
'e-bike'), quoted product names, 'Missing'/'N/A' dummy blanks, NULL-heavy
typed columns, bad emails/zips/phones, leading spaces, embedded delimiters,
duplicate rows, and arithmetic that doesn't balance.  This module
re-derives the same FLAW CLASSES over original rows (no reference data is
copied) so the profile → screen → generate → execute → score loop has
something real to find.

Deterministic: plain literal rows, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_PRODUCT_TYPES = ["Bicycle", "E-bike", "EBIKE", "Ebike", "e-bike",
                  "E-scooter", "Bicycle", "E-bike", "E-scooter", "Bicycle"]
_FRAME_SIZES = ["Small", "Medium", "Large", "N/A", "Missing"]
_COLORS = ["Red", "Blue", "Green", "Silver", "Black", "Yellow", "White"]

_NAMES = [
    "Morning Comet", "Harbor Drift", "Cedar Sprint", "Quiet Falcon",
    "Copper Trail", "Summit Echo", "River Dart", "Lantern Glide",
    "Prairie Arc", "Slate Runner", "Willow Dash", "Granite Loop",
    "Amber Circuit", "Fog Cutter", "Juniper Swift", "Cobalt Drifter",
    "Maple Venture", "Dune Skipper", "Birch Voyager", "Onyx Strider",
]

_CITIES = ["Springfield", "Riverton", "Lakewood", "Fairview", "Georgetown"]
_STATES = ["MA", "CO", "WA", "TX", "NY", "XX"]          # XX = invalid


def _products() -> list[tuple]:
    rows = []
    for i, name in enumerate(_NAMES):
        ptype = _PRODUCT_TYPES[i % len(_PRODUCT_TYPES)]
        is_bike = ptype.lower().startswith("bicycle")
        quoted = i % 7 == 3                   # seeded Quoted_Values flaw
        rows.append((
            30000 + i,
            f"'{name}'" if quoted else name,
            f"{ptype} in {_COLORS[i % len(_COLORS)]} color",
            ptype,
            _FRAME_SIZES[i % len(_FRAME_SIZES)],          # dummy blanks
            None if is_bike else 2 + i % 11,              # battery_life
            None if is_bike else float(10 + (i * 3) % 21),
            float(60 + (i * 17) % 190),
            _COLORS[(i * 3) % len(_COLORS)],
            float([24, 26, 28, 29][i % 4]),
            None if not is_bike else 1 + (i * 5) % 21,
            round(100 + (i * 97.13) % 1900, 2),
            float(1 + i % 10),
        ))
    return rows


def _customers() -> list[tuple]:
    first = ["Ana", "Ben", "Caro", "Dev", "Elle", "Finn", "Gita", "Hugo",
             "Iris", "Jon"]
    last = ["Stone", "Reyes", "Okafor", "Lindt", "Moreau", "Park", "Quinn",
            "Sato", "Toledo", "Ueda"]
    rows = []
    for i in range(40):
        f, la = first[i % 10], last[(i * 3) % 10]
        email = (f"{f.lower()}.{la.lower()}@example.com" if i % 9 != 4
                 else f"{f.lower()}-at-example")            # bad email
        zipc = f"{10000 + i * 731 % 89999:05d}" if i % 11 != 7 else "ABC12"
        rows.append((
            50000 + i,
            f" {f}" if i % 13 == 5 else f,                  # leading space
            la,
            f"{100 + i} {_NAMES[i % 20].split()[0]} St"
            + ("|Unit 2" if i % 10 == 6 else ""),           # embedded delim
            _CITIES[i % 5],
            _STATES[i % 6],
            zipc,
            email,
            ["M", "F", "Male", "F", "M"][i % 5],            # inconsistent
            f"2023-0{1 + i % 9}-{1 + i % 27:02d}",
        ))
    return rows


def _sales() -> list[tuple]:
    rows = []
    sid = 0
    for i in range(120):
        pid = 30000 + (i * 7) % 20
        cid = 50000 + (i * 11) % 40
        qty = 1 + i % 4
        unit = round(100 + (pid % 20) * 83.7, 2)
        total = round(qty * unit, 2) if i % 15 != 9 else round(qty * unit - 25.0, 2)
        rows.append((sid, pid, cid, qty, unit, total,
                     f"2023-{1 + i % 12:02d}-{1 + i % 28:02d}", "complete"))
        sid += 1
    # seeded duplicate rows (Dupe_Rows / Potential_Duplicates)
    rows.extend([rows[3][:1] + rows[3][1:], rows[17][:1] + rows[17][1:]])
    return rows


def build_quickstart_tables(spark: SparkSession) -> dict[str, DataFrame]:
    products = spark.createDataFrame(
        _products(),
        "product_id int, product_name string, product_description string, "
        "product_type string, frame_size string, battery_life int, "
        "max_speed double, weight_capacity double, color string, "
        "wheel_size double, gear_count int, price double, "
        "max_discount double")
    customers = spark.createDataFrame(
        _customers(),
        "customer_id int, first_name string, last_name string, "
        "address string, city string, state string, postal_code string, "
        "email string, gender string, last_contact string")
    from pyspark.sql import functions as F
    customers = customers.withColumn(
        "last_contact", F.col("last_contact").cast("date"))
    sales = spark.createDataFrame(
        _sales(),
        "sale_id int, product_id int, customer_id int, quantity int, "
        "unit_price double, total_amount double, sale_date string, "
        "status string")
    sales = sales.withColumn("sale_date", F.col("sale_date").cast("date"))
    return {"products": products, "customers": customers, "sales": sales}
