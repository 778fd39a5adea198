"""One-shot source rewrite: wrap integral SUM(...) AS <alias> oracle
expressions in CAST(... AS BIGINT) so DuckDB returns BIGINT (not
HUGEINT) and the driver's Arrow/pandas value-hash matches Spark's
LongType output. Targets come from tools/audit_types.py output.

Run from repo root: python tools/fix_hugeint.py [--dry]
"""

from __future__ import annotations

import sys

# file -> aliases whose SUM must be BIGINT-cast
TARGETS: dict[str, set[str]] = {
    "automatic_etl_spark/plans/relational.py": {
        "high_cnt", "not_null_cnt", "null_cnt", "segment_nulls",
        "high_line_count", "low_line_count", "lag_ms_total",
        "total_events", "{t}",
    },
    "automatic_etl_spark/plans/cleaning_plans.py": {
        "null_cnt", "valid_cnt", "total", "total_pk_filled", "total_len",
        "repaired_cnt", "clamped_cnt", "overflow_cnt", "safe_total",
        "size_total", "date_nulls", "id_total", "pk_filled_cnt",
        "char_total", "n_total",
    },
    "automatic_etl_spark/plans/views_plans.py": {"fecha_nulls", "fecha_valid"},
    "automatic_etl_spark/plans/text_plans.py": {
        "bpe_tokens", "total_chars", "ws_tokens", "dup_groups",
        "keeper_id_total", "removable_rows",
    },
    "automatic_etl_spark/plans/dedup_plans.py": {
        "keeper_id_total", "a_id_total", "b_id_total", "dup_buckets",
        "removable_rows", "cents_total",
    },
    "automatic_etl_spark/plans/cdc_plans.py": {
        "user_total", "cents_total", "lag_ms_total", "closed_ms_total",
        "current_cnt", "weighted_cents",
    },
    "automatic_etl_spark/plans/ingest_plans.py": {"user_total"},
    "automatic_etl_spark/plans/multimodal_plans.py": {
        "bytes_total", "height_total", "width_total",
        "resized_height_total", "resized_width_total", "offset_total",
    },
    "automatic_etl_spark/plans/catalog_plans.py": {
        "key_total", "null_cnt", "closed_ms_total", "current_cnt",
    },
    "automatic_etl_spark/plans/storage_plans.py": {
        "cents_total", "user_total", "char_total", "ws_tokens",
    },
}


def rewrite(content: str, aliases: set[str]) -> tuple[str, int]:
    out: list[str] = []
    i = 0
    n = len(content)
    hits = 0
    while i < n:
        j = content.find("SUM(", i)
        if j < 0:
            out.append(content[i:])
            break
        # skip if already wrapped: preceding non-space text ends with CAST(
        prefix = content[max(0, j - 8):j].rstrip()
        if prefix.endswith("CAST("):
            out.append(content[i : j + 4])
            i = j + 4
            continue
        # balanced-paren scan for SUM's closing paren
        depth = 1
        k = j + 4
        while k < n and depth:
            if content[k] == "(":
                depth += 1
            elif content[k] == ")":
                depth -= 1
            k += 1
        if depth:
            out.append(content[i:])
            break
        # what follows? allow whitespace / newline / f-string splice " f"
        m = k
        while m < n and (content[m] in ' \t\n"' or content[m : m + 1] == "f"):
            if content[m] == '"':
                # f-string literal boundary inside oracle builders
                m += 1
                continue
            m += 1
        matched = None
        if content[m : m + 3] == "AS ":
            rest = content[m + 3 :]
            for a in sorted(aliases, key=len, reverse=True):
                if rest.startswith(a) and not (
                    len(rest) > len(a)
                    and (rest[len(a)].isalnum() or rest[len(a)] == "_")
                ):
                    matched = a
                    break
        if matched:
            out.append(content[i:j])
            out.append("CAST(")
            out.append(content[j:k])
            out.append(" AS BIGINT)")
            i = k
            hits += 1
        else:
            out.append(content[i : j + 4])
            i = j + 4
    return "".join(out), hits


def main() -> None:
    dry = "--dry" in sys.argv
    total = 0
    for path, aliases in TARGETS.items():
        with open(path) as fh:
            content = fh.read()
        new, hits = rewrite(content, aliases)
        total += hits
        print(f"{path}: {hits} SUMs wrapped")
        if not dry and hits:
            with open(path, "w") as fh:
                fh.write(new)
    print(f"total: {total}")


if __name__ == "__main__":
    main()
