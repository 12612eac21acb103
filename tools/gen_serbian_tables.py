"""Generate lucene_spark/analysis/sr_tables.py from the generated snowball
SerbianStemmer.java (data-only extraction: among suffix inventories + the
case->replacement switch mapping; control flow is reimplemented by hand in
sr.py from the published algorithm)."""
import re
import sys

SRC = (
    "/root/reference/lucene/analysis/common/src/java/org/tartarus/"
    "snowball/ext/SerbianStemmer.java"
)


def parse_amongs(src):
    tables = {}
    for m in re.finditer(r"Among (a_\d+)\[\] =\s*\{(.*?)\};", src, re.S):
        rows = []
        for am in re.finditer(
            r'new Among\(\s*"((?:[^"\\]|\\.)*)"\s*,\s*(-?\d+)\s*,\s*(-?\d+)',
            m.group(2),
        ):
            s = am.group(1).encode().decode("unicode_escape")
            rows.append((s, int(am.group(3))))
        tables[m.group(1)] = rows
    return tables


def parse_switch(src, routine):
    """case N -> (replacement, needs_no_diacritics) from one r_* body."""
    m = re.search(
        rf"private boolean {routine}\(\).*?switch \(among_var\) \{{(.*?)\n    \}}",
        src,
        re.S,
    )
    body = m.group(1)
    cases = {}
    for cm in re.finditer(
        r"case (\d+):\s*(.*?)break;", body, re.S
    ):
        n, cb = int(cm.group(1)), cm.group(2)
        nd = "B_no_diacritics" in cb
        rm = re.search(r'slice_from\("((?:[^"\\]|\\.)*)"\)', cb)
        repl = rm.group(1).encode().decode("unicode_escape")
        cases[n] = (repl, nd)
    return cases


def main():
    src = open(SRC, encoding="utf-8").read()
    amongs = parse_amongs(src)
    cyr_cases = parse_switch(src, "r_cyr_to_lat")
    s1 = parse_switch(src, "r_Step_1")
    s2 = parse_switch(src, "r_Step_2")

    out = sys.stdout
    out.write(
        '"""Snowball Serbian stemmer tables (data-only extraction from the\n'
        "published algorithm's generated form org/tartarus/snowball/ext/\n"
        "SerbianStemmer.java via tools/gen_serbian_tables.py; see sr.py for\n"
        'the hand-written control flow)."""\n\n'
    )
    cyr = {s: cyr_cases[c][0] for s, c in amongs["a_0"]}
    out.write("CYR_TO_LAT = {\n")
    for s, r in cyr.items():
        out.write(f"    {s!r}: {r!r},\n")
    out.write("}\n\n")
    for name, table, cases in (("STEP1", "a_1", s1), ("STEP2", "a_2", s2)):
        out.write(f"# suffix -> (replacement, needs_no_diacritics)\n")
        out.write(f"{name} = {{\n")
        for s, c in amongs[table]:
            repl, nd = cases[c]
            out.write(f"    {s!r}: ({repl!r}, {nd!r}),\n")
        out.write("}\n\n")
    out.write("STEP3 = frozenset({\n")
    for s, _ in amongs["a_3"]:
        out.write(f"    {s!r},\n")
    out.write("})\n")


if __name__ == "__main__":
    main()
