"""Generate reference-scale person-profile corpora (db10/db50/db100).

The reference benchmarks (BASELINE.md) run on Febrl-style synthetic
person profiles: 12 attributes concatenated into one string
(``notebook.ipynb`` cells 30-35: ``concat(date_of_birth, ' ', surname,
' ', address_1, ..., address_2) as val``, keyed by ``realProfileID``),
with a ground-truth table of duplicate id pairs. Those JSON inputs are
gitignored in the reference repo, so this module regenerates
statistically comparable corpora from scratch:

- ``db10`` / ``db50`` / ``db100`` = 10K / 50K / 100K records,
  60% originals + 40% perturbed duplicates (typos, field drops, field
  replacements — 6-14 modifications per duplicate, tuned so the
  whitespace-token Jaccard quality curve mirrors the reference's
  recorded evaluate() numbers on db10: measured pr/rc/f1
  1.0/0.155/0.268 at t=0.5 (ref 1.0/0.154/0.267) and
  0.989/0.836/0.906 at t=0.2 (ref 0.886/0.879/0.882).
- ``dbN_gt`` = all same-profile id pairs (l_id < r_id).
- Attribute value pools are Zipf-skewed so token document-frequency
  skew (states, common surnames, suburbs) matches the real stress:
  low-threshold prefix filtering has to survive hot tokens.

Deterministic (seeded PCG64); writes parquet under ``refscale/``.

Usage::

    python tools/gen_refscale.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SIZES = {"db10": 10_000, "db50": 50_000, "db100": 100_000}
DUP_FRAC = 0.4
SEED = 20260814

GIVEN_NAMES = [
    "james", "olivia", "jack", "amelia", "william", "charlotte", "noah",
    "mia", "thomas", "isla", "lucas", "grace", "henry", "ruby", "oliver",
    "ella", "leo", "sophie", "charlie", "chloe", "harry", "lily", "ethan",
    "zoe", "samuel", "emily", "daniel", "hannah", "max", "ivy", "alexander",
    "evie", "benjamin", "willow", "joshua", "matilda", "liam", "harper",
    "mason", "sienna", "george", "audrey", "oscar", "savannah", "archie",
    "stella", "edward", "violet", "isaac", "hazel", "patrick", "josephine",
    "declan", "bridget", "angus", "margaret", "lachlan", "eleanor",
    "hamish", "beatrice", "callum", "rosemary", "finn", "clementine",
    "rory", "annabel", "seamus", "imogen", "dougal", "philippa", "ewan",
    "cordelia", "fergus", "gwendolyn", "alistair", "henrietta", "duncan",
    "araminta", "torquil", "wilhelmina",
]
SURNAMES = [
    "smith", "jones", "williams", "brown", "wilson", "taylor", "johnson",
    "white", "martin", "anderson", "thompson", "nguyen", "thomas",
    "walker", "harris", "lee", "ryan", "robinson", "kelly", "king",
    "davis", "wright", "evans", "roberts", "green", "hall", "wood",
    "jackson", "clarke", "patel", "khan", "lewis", "james", "phillips",
    "mason", "mitchell", "rose", "davies", "rodriguez", "cox", "alvarez",
    "garcia", "singh", "chen", "wang", "li", "zhang", "liu", "yang",
    "huang", "fitzgerald", "oconnell", "macdonald", "sutherland",
    "pemberton", "ashworth", "blackwood", "carmichael", "dunleavy",
    "ellsworth", "farnsworth", "galbraith", "hollingsworth", "kingsley",
    "lockhart", "montgomery", "northcote", "ormsby", "pennington",
    "quennell", "ravenscroft", "stanhope", "thorneycroft", "underhill",
    "vanderbilt", "wentworth", "yardley", "zouch",
]
STREET_NAMES = [
    "main", "high", "church", "park", "station", "victoria", "green",
    "mill", "school", "king", "queen", "william", "george", "london",
    "york", "spring", "north", "south", "east", "west", "bridge",
    "water", "forest", "hill", "lake", "river", "garden", "market",
    "chapel", "castle", "windsor", "albert", "elizabeth", "grange",
    "manor", "meadow", "orchard", "poplar", "cedar", "willow", "oak",
    "elm", "birch", "maple", "acacia", "banksia", "waratah", "boronia",
    "grevillea", "jacaranda",
]
STREET_TYPES = ["street", "st", "road", "rd", "avenue", "ave", "place",
                "pl", "crescent", "cres", "lane", "ln", "drive", "dr",
                "court", "crt", "parade", "pde", "terrace", "tce"]
STREET_PREFIXES = ["upper", "lower", "old", "new", "north", "south",
                   "east", "west", "mount", "port", "saint", "glen"]
VILLAGE_NAMES = ["brentwood", "rosewood", "lakeside", "hillcrest",
                 "fairview", "springfield", "riverside", "greenacres",
                 "sunnybank", "woodlands", "meadowbrook", "clearwater",
                 "stonegate", "parkview", "eastwood", "westgrove"]
VILLAGE_TYPES = ["vlge", "village", "mews", "gdns", "gardens", "hts",
                 "heights", "close", "manor", "lodge", "retreat", "rise"]
SUBURBS = [
    "richmond", "newtown", "brighton", "epping", "sunbury", "carlton",
    "fitzroy", "prahran", "toorak", "kew", "hawthorn", "balwyn",
    "doncaster", "ringwood", "croydon", "belgrave", "frankston",
    "dandenong", "berwick", "cranbourne", "werribee", "sunshine",
    "footscray", "essendon", "coburg", "preston", "reservoir", "bundoora",
    "eltham", "greensborough", "parramatta", "penrith", "liverpool",
    "bankstown", "hurstville", "chatswood", "hornsby", "manly", "bondi",
    "randwick", "cronulla", "blacktown", "campbelltown", "gosford",
    "woollahra", "mosman", "ryde", "strathfield", "auburn", "cabramatta",
    "ipswich", "toowoomba", "cairns", "townsville", "mackay",
    "rockhampton", "bundaberg", "gladstone", "maryborough", "gympie",
]
STATES = ["nsw", "vic", "qld", "wa", "sa", "tas", "act", "nt"]
UNIT_TYPES = ["unit", "u", "flat", "fl", "apartment", "apt", "suite",
              "ste", "villa", "twnhs", "lot", "rm"]
ALPHABET = "abcdefghijklmnopqrstuvwxyz"

# Pool expansion: the hand-written base lists alone make unrelated
# profiles collide on 5-6 head values and flood t=0.2 with false
# positives (measured pr 0.53 vs the reference's 0.886 on its Febrl
# data, which draws from real name-frequency tables with thousands of
# entries). Single-token programmatic variants push pool sizes into
# Febrl's range while keeping the Zipf head (smith, main street, nsw)
# hot enough to stress prefix filtering.
GIVEN_NAMES = GIVEN_NAMES + [
    g + s for g in GIVEN_NAMES for s in ("anne", "may", "lee", "rose")
]
SURNAMES = SURNAMES + [
    a + "-" + b
    for i, a in enumerate(SURNAMES[:40])
    for b in SURNAMES[40:64]
    if (i + len(b)) % 2 == 0
]
SUBURBS = SUBURBS + [
    s + suf
    for s in SUBURBS
    for suf in ("ville", "wood", "field", "dale", "bury", "ton")
]
STREET_NAMES = STREET_NAMES + [
    s + suf for s in STREET_NAMES for suf in ("gate", "leigh", "mere")
]

# attribute order used by the reference's concat (notebook cell 32)
ATTR_ORDER = [
    "date_of_birth", "surname", "address_1", "street_number", "postcode",
    "soc_sec_id", "suburb", "phone_number", "state", "given_name", "age",
    "address_2",
]


def _zipf_choice(rng: np.random.Generator, pool_size: int, n: int,
                 a: float = 0.5) -> np.ndarray:
    """Zipf-skewed index choice over ``pool_size`` items."""
    ranks = np.arange(1, pool_size + 1, dtype=np.float64)
    p = ranks ** (-a)
    p /= p.sum()
    return rng.choice(pool_size, size=n, p=p)


def _make_originals(rng: np.random.Generator, n: int) -> list[dict]:
    given = _zipf_choice(rng, len(GIVEN_NAMES), n)
    sur = _zipf_choice(rng, len(SURNAMES), n)
    street = _zipf_choice(rng, len(STREET_NAMES), n)
    stype = rng.integers(0, len(STREET_TYPES), n)
    has_spfx = rng.random(n) < 0.35
    spfx = rng.integers(0, len(STREET_PREFIXES), n)
    suburb = _zipf_choice(rng, len(SUBURBS), n)
    state = _zipf_choice(rng, len(STATES), n, a=1.1)
    snum = rng.integers(1, 400, n)
    postcode = rng.integers(2000, 8000, n)
    ssid = rng.integers(1_000_000, 9_999_999, n)
    year = rng.integers(1920, 2006, n)
    month = rng.integers(1, 13, n)
    day = rng.integers(1, 29, n)
    phone_area = rng.integers(20, 100, n)
    phone_num = rng.integers(10_000_000, 99_999_999, n)
    # address_2: Febrl-style — a unit/flat line or a village line,
    # present for most records (two extra tokens keep the t=0.2
    # overlap requirement at >= 5 tokens, matching the reference's
    # false-positive regime).
    a2_kind = rng.random(n)
    unit_type = rng.integers(0, len(UNIT_TYPES), n)
    unit_num = rng.integers(1, 60, n)
    vname = _zipf_choice(rng, len(VILLAGE_NAMES), n)
    vtype = rng.integers(0, len(VILLAGE_TYPES), n)
    recs = []
    for i in range(n):
        a1 = f"{STREET_NAMES[street[i]]} {STREET_TYPES[stype[i]]}"
        if has_spfx[i]:
            a1 = f"{STREET_PREFIXES[spfx[i]]} {a1}"
        if a2_kind[i] < 0.40:
            a2 = f"{UNIT_TYPES[unit_type[i]]} {unit_num[i]}"
        elif a2_kind[i] < 0.70:
            a2 = f"{VILLAGE_NAMES[vname[i]]} {VILLAGE_TYPES[vtype[i]]}"
        else:
            a2 = None
        recs.append({
            "date_of_birth": f"{year[i]:04d}{month[i]:02d}{day[i]:02d}",
            "surname": SURNAMES[sur[i]],
            "address_1": a1,
            "street_number": str(snum[i]),
            "postcode": f"{postcode[i]:04d}",
            "soc_sec_id": str(ssid[i]),
            "suburb": SUBURBS[suburb[i]],
            "phone_number": f"{phone_area[i]:02d} {phone_num[i]:08d}",
            "state": STATES[state[i]],
            "given_name": GIVEN_NAMES[given[i]],
            "age": str(2024 - year[i]),
            "address_2": a2,
        })
    return recs


def _typo(rng: np.random.Generator, word: str) -> str:
    if not word:
        return rng.choice(list(ALPHABET))
    kind = rng.integers(0, 4)
    pos = int(rng.integers(0, len(word)))
    ch = ALPHABET[int(rng.integers(0, 26))]
    if kind == 0:                                # substitute
        return word[:pos] + ch + word[pos + 1:]
    if kind == 1:                                # insert
        return word[:pos] + ch + word[pos:]
    if kind == 2 and len(word) > 1:              # delete
        return word[:pos] + word[pos + 1:]
    if len(word) > 1:                            # transpose
        pos = min(pos, len(word) - 2)
        return word[:pos] + word[pos + 1] + word[pos] + word[pos + 2:]
    return word + ch


def _perturb(rng: np.random.Generator, rec: dict) -> dict:
    """Apply 6-14 token-changing modifications (typo / field drop /
    field replacement) — tuned so whitespace-Jaccard between original
    and duplicate spans the reference's recorded recall curve
    (rc ~0.15 at t=0.5, ~0.88 at t=0.2 on db10)."""
    dup = dict(rec)
    n_mods = int(rng.integers(6, 15))
    fields = [f for f in ATTR_ORDER]
    for _ in range(n_mods):
        f = fields[int(rng.integers(0, len(fields)))]
        v = dup.get(f)
        action = rng.integers(0, 10)
        if action < 6:                            # typo in one token
            if v is None:
                continue
            words = v.split(" ")
            wi = int(rng.integers(0, len(words)))
            words[wi] = _typo(rng, words[wi])
            dup[f] = " ".join(words)
        elif action < 8:                          # drop the field
            dup[f] = None
        else:                                     # replace wholesale
            if f == "given_name":
                dup[f] = GIVEN_NAMES[int(rng.integers(0, len(GIVEN_NAMES)))]
            elif f == "surname":
                dup[f] = SURNAMES[int(rng.integers(0, len(SURNAMES)))]
            elif f == "suburb":
                dup[f] = SUBURBS[int(rng.integers(0, len(SUBURBS)))]
            elif f == "state":
                dup[f] = STATES[int(rng.integers(0, len(STATES)))]
            elif f == "street_number":
                dup[f] = str(int(rng.integers(1, 400)))
            elif f == "postcode":
                dup[f] = f"{int(rng.integers(2000, 8000)):04d}"
            elif f == "age":
                dup[f] = str(int(rng.integers(18, 99)))
            elif v is not None:
                words = v.split(" ")
                wi = int(rng.integers(0, len(words)))
                words[wi] = _typo(rng, words[wi])
                dup[f] = " ".join(words)
    return dup


def _concat_val(rec: dict) -> str:
    """Space-joined non-null attributes in the reference's concat
    order (DuckDB concat skips NULL arguments)."""
    return " ".join(rec[f] for f in ATTR_ORDER if rec[f] is not None)


def generate(name: str, n_total: int, out_dir: str) -> None:
    rng = np.random.default_rng([SEED, n_total])
    n_dup = int(n_total * DUP_FRAC)
    n_orig = n_total - n_dup
    originals = _make_originals(rng, n_orig)

    # each duplicate derives from a random original; originals may own
    # several duplicates (GT = all same-profile pairs, l_id < r_id)
    owner = rng.integers(0, n_orig, n_dup)
    records = list(originals)
    groups: dict[int, list[int]] = {}
    for d in range(n_dup):
        o = int(owner[d])
        records.append(_perturb(rng, originals[o]))
        groups.setdefault(o, []).append(n_orig + d)

    # shuffle ids so duplicates are not clustered at the tail
    perm = rng.permutation(n_total)           # row i gets id perm[i]
    ids = perm.astype(np.int64)
    vals = [_concat_val(r) for r in records]

    gt_l, gt_r = [], []
    for o, dups in groups.items():
        members = [int(ids[o])] + [int(ids[d]) for d in dups]
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                gt_l.append(members[i])
                gt_r.append(members[j])

    os.makedirs(out_dir, exist_ok=True)
    cols: dict[str, pa.Array] = {"id": pa.array(ids)}
    for f in ATTR_ORDER:
        cols[f] = pa.array([r[f] for r in records], type=pa.string())
    cols["val"] = pa.array(vals, type=pa.string())
    pq.write_table(pa.table(cols), os.path.join(out_dir, f"{name}.parquet"),
                   row_group_size=4096)
    pq.write_table(
        pa.table({"l_id": pa.array(gt_l, type=pa.int64()),
                  "r_id": pa.array(gt_r, type=pa.int64())}),
        os.path.join(out_dir, f"{name}_gt.parquet"), row_group_size=65536,
    )
    toks = [len(set(v.split())) for v in vals[:2000]]
    print(f"{name}: {n_total} rows ({n_orig} orig + {n_dup} dup), "
          f"{len(gt_l)} gt pairs, ~{np.mean(toks):.1f} distinct "
          f"ws-tokens/record -> {out_dir}/{name}.parquet")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "refscale",
    )
    for name, n in SIZES.items():
        generate(name, n, out_dir)


if __name__ == "__main__":
    main()
