"""Generate the embedded Public Suffix List lookup table.

Reads the REAL Public Suffix List shipped with the OS
(``/usr/share/publicsuffix/public_suffix_list.dat`` — Mozilla PSL, public
data distributed under the MPL-2.0 *data* grant; Debian packages it as
``publicsuffix``) and compiles it into per-depth numpy string arrays at
``datasketches_postgresql_spark/textops/psl_table.npz``:

- ``exact_<d>``: exact rules with d labels ("com", "co.uk", "github.io");
- ``wild_<d>``:  BASE X of wildcard rules ``*.X`` where X has d labels
  (the matching public suffix then has d+1 labels);
- ``exc_<d>``:   exception rules ``!R`` with d labels (R itself is the
  registrable domain when it suffixes the host).

Both the ICANN and PRIVATE sections are kept — the private section is
exactly what a crawl pipeline needs (``github.io``, ``blogspot.*``, …:
platform subdomains are independent publishers and must not collapse into
one "domain" under a per-domain cap).

Every unicode rule is emitted in BOTH its unicode and punycode (xn--)
forms, since crawled hosts appear punycoded on the wire.

Provenance mirrors tools/gen_cpc_tables.py: this is public DATA compiled
to a lookup table, not code. Rerun after an OS PSL update:

    python tools/gen_psl_table.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

PSL_PATHS = [
    "/usr/share/publicsuffix/public_suffix_list.dat",
    "/etc/java-17-openjdk/security/public_suffix_list.dat",
]
OUT = (
    Path(__file__).resolve().parent.parent
    / "datasketches_postgresql_spark"
    / "textops"
    / "psl_table.npz"
)

MAX_DEPTH = 5  # deepest rule in the current list; asserted below


def _puny_label(label: str) -> str | None:
    if label.isascii():
        return label
    try:
        return "xn--" + label.encode("punycode").decode("ascii")
    except UnicodeError:
        return None


def _forms(rule: str) -> list[str]:
    """The rule itself plus its punycode form when any label is unicode."""
    out = [rule]
    if not rule.isascii():
        puny = [_puny_label(lb) for lb in rule.split(".")]
        if all(p is not None for p in puny):
            out.append(".".join(puny))  # type: ignore[arg-type]
    return out


def parse(path: str):
    exact: dict[int, set[str]] = {}
    wild: dict[int, set[str]] = {}
    exc: dict[int, set[str]] = {}
    n_rules = 0
    for raw in Path(path).read_text(encoding="utf-8").splitlines():
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        line = line.split()[0].lower()  # spec: canonical rules are one token
        n_rules += 1
        if line.startswith("!"):
            for form in _forms(line[1:]):
                exc.setdefault(form.count(".") + 1, set()).add(form)
        elif line.startswith("*."):
            for form in _forms(line[2:]):
                wild.setdefault(form.count(".") + 1, set()).add(form)
        else:
            for form in _forms(line):
                exact.setdefault(form.count(".") + 1, set()).add(form)
    return exact, wild, exc, n_rules


def main() -> int:
    src = next((p for p in PSL_PATHS if Path(p).exists()), None)
    if src is None:
        print("no public_suffix_list.dat found", file=sys.stderr)
        return 1
    exact, wild, exc, n_rules = parse(src)
    assert max(exact) <= MAX_DEPTH and max(wild) + 1 <= MAX_DEPTH, (
        max(exact),
        max(wild),
    )
    # sanity: entries the round-3 heuristic famously missed
    assert "github.io" in exact[2] and "co.id" in exact[2] and "com.hk" in exact[2]
    assert "ck" in {b for d in wild for b in wild[d]}  # *.ck
    assert "www.ck" in exc[2]  # !www.ck
    arrays: dict[str, np.ndarray] = {}
    for name, table in (("exact", exact), ("wild", wild), ("exc", exc)):
        for d, vals in sorted(table.items()):
            arrays[f"{name}_{d}"] = np.array(sorted(vals), dtype=np.str_)
    np.savez_compressed(OUT, source=np.array([src, f"rules={n_rules}"]), **arrays)
    sizes = {k: len(v) for k, v in arrays.items()}
    print(f"wrote {OUT} from {src}: {n_rules} rules -> {sizes}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
