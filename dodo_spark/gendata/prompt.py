"""B15 prompt assembly: the deterministic, network-free part of the
reference's LLM genconf authoring flow (``src/llm.go:23-116`` — build the
chat messages; ``src/prompt/gendata.xml`` — the system document).

The reference sends three messages: a fixed SYSTEM document teaching the
genconf YAML dialect, an ASSISTANT prefix forcing fenced-YAML output, and
a USER message packing the (anonymized) table DDL, per-table column
stats, and sample queries into ``<tables>`` / ``<column-stats>`` /
``<queries>`` sections (``llm.go:40-56``), plus an optional
``<additional-user-prompt>`` (``llm.go:57-63``). Everything up to the
HTTPS call is a pure string function — implemented here and exposed as
``genconf-infer --emit-prompt`` so a user can pipe the exact prompt into
any LLM endpoint themselves. The system document below is written fresh
for THIS engine's genconf dialect (``gendata/rules.py``), not copied
from the reference's.
"""

from __future__ import annotations

ASSISTANT_PREFIX = "```yaml\n"  # forces fenced-YAML completion (llm.go:19)

# The system document: teaches the genconf dialect this repo's gendata
# actually consumes (rule shapes per gendata/rules.py, format tags per
# gendata/format_tags.py). Structured like the reference's gendata.xml
# (request / requirements / usage) but authored for the PySpark engine.
SYSTEM_PROMPT = """\
<prompt>
<request>
You are generating YAML configuration for a data-generation tool
(used via `dodo-spark gendata --genconf gendata.yaml`) from the table
DDL, optional per-column statistics, and optional sample queries in the
user prompt. The generated data must make the sample queries return
plausible, non-empty results.
</request>

<requirements>
1. Generated data must satisfy the table constraints in the DDL
   (key uniqueness, partition ranges).
2. Prefer the column statistics for value ranges, cardinalities and
   null rates; when a query predicate conflicts with the stats, satisfy
   the query predicate.
3. Only use the rule forms documented below — nothing else.
4. Columns not referenced by any query predicate may rely on their
   type-default rules (omit them).
5. Output exactly one valid YAML document and nothing else.
</requirements>

<usage>
A genconf YAML holds global rules plus per-table column rules
(table-level overrides global; `gen:` overrides everything for its
column except `null_frequency` and `format`). Up to 128 documents may
be concatenated with `---`, each generating one round.

Rule forms per column (all optional):
- `null_frequency: <0..1>` — probability of NULL.
- `length: {min: N, max: N}` — string/array/map length bounds.
- `min` / `max` — numeric, date or datetime range bounds.
- `precision` / `scale` — DECIMAL shape.
- `format: <tag>` — deterministic tagged text (e.g. name, email, city).
- `gen: {inc: <step>, start: <n>}` — dense unique increasing key.
- `gen: {enum: [...], weights: [...]}` — categorical vocabulary with
  sampling weights (weights sum to 1).
- `gen: {parts: [...]}` — concatenation of sub-rules (requires format).
- `gen: {ref: <table.column>}` — foreign key into another table's
  generated values.
- `gen: {type: <TYPE>}` — override the generated type (e.g. DECIMAL).
- `structure: STRUCT<...>` — JSON/VARIANT shape.

Example:

```yaml
null_frequency: 0
tables:
- name: orders
  row_count: 10000
  columns:
  - name: o_orderkey
    gen: {inc: 1, start: 1}
  - name: o_status
    gen: {enum: [O, F, P], weights: [0.5, 0.3, 0.2]}
  - name: o_totalprice
    gen: {type: DECIMAL}
    precision: 12
    scale: 2
    min: 1
    max: 500000
```
</usage>
</prompt>
"""


def assemble_user_prompt(
    tables: list[str],
    column_stats: list[str],
    sqls: list[str],
    extra: str | None = None,
) -> str:
    """The user message: DDL statements joined by newline, stats documents
    joined by ``---``, queries joined by newline — the reference's exact
    section layout (``llm.go:40-56``), so a prompt produced here is
    drop-in for the same endpoints."""
    user = (
        "\n<tables>\n"
        + "\n".join(tables)
        + "\n</tables>\n\n\n<column-stats>\n"
        + "\n---\n".join(column_stats)
        + "\n</column-stats>\n\n\n<queries>\n"
        + "\n".join(sqls)
        + "\n</queries>\n"
    )
    if extra:
        user = f"{user}\n<additional-user-prompt>\n{extra}\n</additional-user-prompt>\n"
    return user


def assemble_gendata_prompt(
    tables: list[str],
    column_stats: list[str],
    sqls: list[str],
    extra: str | None = None,
) -> dict[str, str]:
    """The full chat-message set the LLM flow would send: system document,
    assistant fenced-YAML prefix, user payload. Pure function — callers
    own the (out-of-scope here) network call."""
    return {
        "system": SYSTEM_PROMPT,
        "assistant_prefix": ASSISTANT_PREFIX,
        "user": assemble_user_prompt(tables, column_stats, sqls, extra),
    }
