"""Extract `new Among("...", parent, result)` tables from a generated
snowball Java stemmer into Python literals (data only — the published
algorithm's suffix inventory; control flow is reimplemented by hand)."""
import re
import sys


def extract(path):
    src = open(path, encoding="utf-8").read()
    tables = {}
    for m in re.finditer(
        r"Among (a_\d+)\[\] =\s*\{(.*?)\};", src, re.S
    ):
        name, body = m.group(1), m.group(2)
        rows = []
        for am in re.finditer(
            r'new Among\(\s*"((?:[^"\\]|\\.)*)"\s*,\s*(-?\d+)\s*,\s*(-?\d+)', body
        ):
            s = am.group(1).encode().decode("unicode_escape")
            rows.append((s, int(am.group(3))))
        tables[name] = rows
    return tables


if __name__ == "__main__":
    for name, rows in extract(sys.argv[1]).items():
        print(f"{name} = (")
        for s, res in rows:
            print(f"    ({s!r}, {res}),")
        print(")")
