"""Instruction-tree operators over the flattened per-tx instruction array.

The reference keeps a real tree and filters it recursively
(src/transform/Instruction.py:78-88,269-288); we keep the tree *flattened
per transaction* (preorder, hierarchical gen_ids) so both filter modes are
plain array expressions — no shuffle, no recursion:

* ``flatten=True``  — keep exactly the matching nodes (the reference
  flattens first, which drops child lists, so only self-matches survive —
  proven by test/transform/test_Instruction.py:82-90).
* ``flatten=False`` — hierarchical: an inner node survives iff it matches;
  an outer node survives iff it matches **or any of its children match**
  (the reference prunes non-matching children of a matching outer, which in
  the flat encoding is the same predicate applied to each node).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def is_of(node: Column, program_name: str, instruction_type: str | None = None) -> Column:
    """``Instruction.is_of`` (reference src/transform/Instruction.py:208-210,
    133-135): parsed instructions match on program name and optional type;
    partially-parsed instructions (no ``program`` field) never match."""
    cond = node["program"] == F.lit(program_name)
    if instruction_type is not None:
        cond = cond & (
            F.get_json_object(node["parsed"], "$.type") == F.lit(instruction_type)
        )
    return F.coalesce(cond, F.lit(False))


def filter_instructions(
    txs: DataFrame,
    program_name: str,
    instruction_type: str | None = None,
    flatten: bool = False,
    instructions_col: str = "instructions",
    output_col: str | None = None,
) -> DataFrame:
    """Filter each transaction's instruction array (F9). Preorder is
    preserved because ``filter`` is order-stable."""
    output_col = output_col or instructions_col
    arr = F.col(instructions_col)

    def self_match(x: Column) -> Column:
        return is_of(x, program_name, instruction_type)

    if flatten:
        pred = self_match
    else:

        def pred(x: Column) -> Column:
            child_match = F.exists(
                arr,
                lambda y: F.coalesce(y["parent_id"] == x["gen_id"], F.lit(False))
                & is_of(y, program_name, instruction_type),
            )
            return self_match(x) | (x["inner_pos"].isNull() & child_match)

    return txs.withColumn(output_col, F.filter(arr, pred))
