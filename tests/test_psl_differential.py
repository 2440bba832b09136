"""Differential test for the PSL-backed registrable_domain expression: a
pure-Python longest-match/wildcard/exception implementation (written
independently from the Column-expression one, reading the same compiled
table) must agree with the Spark expression on thousands of generated
hosts — random label stacks over real public suffixes, wildcard bases,
exception rules, bare suffixes, unknown TLDs, and IP literals."""

import io
import random
from importlib import resources

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_postgresql_spark.textops.urlops import registrable_domain


@pytest.fixture(scope="module")
def psl_table():
    data = resources.files("datasketches_postgresql_spark.textops").joinpath(
        "psl_table.npz"
    ).read_bytes()
    with np.load(io.BytesIO(data)) as z:
        return {k: set(z[k].tolist()) for k in z.files if k != "source"}


def psl_ref(host: str, table) -> str:
    """Independent reference: the publicsuffix.org algorithm, literally.
    Prevailing rule = matching exception, else longest matching rule,
    else '*'; registrable = public suffix + one label (host itself when
    it IS a suffix)."""
    if not host:
        return host
    if host.startswith("[") or all(
        p.isdigit() for p in host.split(".")
    ) and host.count(".") == 3:
        return host
    labels = host.split(".")
    n = len(labels)

    def suffix(d):
        return ".".join(labels[n - d:])

    # exceptions first
    for d in range(min(n, 5), 0, -1):
        if suffix(d) in table.get(f"exc_{d}", ()):
            return suffix(d)
    ps = 1
    for d in range(1, 6):
        if d <= n and suffix(d) in table.get(f"exact_{d}", ()):
            ps = max(ps, d)
        if d + 1 <= n and suffix(d) in table.get(f"wild_{d}", ()):
            ps = max(ps, d + 1)
    return suffix(ps + 1) if n > ps else host


def _gen_hosts(table, n=2500, seed=4):
    rng = random.Random(seed)
    exacts = sorted(s for d in range(1, 6) for s in table.get(f"exact_{d}", ()))
    wilds = sorted(s for d in range(1, 5) for s in table.get(f"wild_{d}", ()))
    excs = sorted(s for d in range(1, 6) for s in table.get(f"exc_{d}", ()))
    labels = ["www", "a", "blog", "x9", "sub", "deep", "site"]
    hosts = []
    for _ in range(n):
        kind = rng.random()
        if kind < 0.45:
            base = rng.choice(exacts)
        elif kind < 0.65:
            base = rng.choice(labels) + "." + rng.choice(wilds)
        elif kind < 0.72:
            base = rng.choice(excs)
        elif kind < 0.85:
            base = rng.choice(labels) + ".unknowntld" + str(rng.randint(0, 9))
        else:
            base = rng.choice(exacts)  # bare suffix, no extra labels
            hosts.append(base)
            continue
        stack = [rng.choice(labels) for _ in range(rng.randint(0, 3))]
        hosts.append(".".join(stack + [base]))
    hosts += ["192.168.0.1", "10.0.0.255", "localhost"]
    # only ascii (the expression lowercases; unicode forms are pinned in
    # test_textops' fixture cases) and no stray whitespace
    return [h for h in hosts if h.isascii()]


def test_spark_expression_matches_reference(spark, psl_table):
    hosts = _gen_hosts(psl_table)
    df = spark.createDataFrame(
        [("https://" + h + "/p",) for h in hosts], "url string"
    )
    got = [
        r["d"] for r in df.select(registrable_domain(F.col("url")).alias("d")).collect()
    ]
    bad = [
        (h, g, psl_ref(h, psl_table))
        for h, g in zip(hosts, got)
        if g != psl_ref(h, psl_table)
    ]
    assert not bad, bad[:10]
