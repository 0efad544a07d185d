"""Registry-wide output-schema guard.

The driver's correctness harness canonicalizes result rows with pandas,
which cannot hash list/dict cells — round 6's only red row was
``event_training_sequences`` emitting an ``array<string>`` column
(TypeError: unhashable type: 'list' inside pandas factorization).  This
test constructs EVERY registered query's plan and asserts its output
schema is scalar-only, so a driver-uncheckable schema can never be
registered again.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType, StructType


def test_every_registered_query_output_is_scalar_only(registry_frames):
    # shared once-per-suite construction (conftest.registry_frames): the
    # schemas checked are still the exact frames the driver hashes — this
    # guard and the plan lint just stopped constructing them twice
    frames, build_errors = registry_frames
    assert not build_errors, f"queries failed to construct: {build_errors}"
    bad: list[str] = []
    for name, df in frames.items():
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not bad, (
        "driver-unhashable (non-scalar) output columns found:\n  "
        + "\n  ".join(bad)
    )


# Cost note: constructing every plan EXECUTES the eager operators (training
# loops, the streaming ingest job) — deliberate: the guard must see the
# exact DataFrame the driver will hash, not a declared schema that could
# drift from it.
