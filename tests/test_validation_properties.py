"""Property-based checks (hypothesis) for the append-time validation
and canonicalization primitives — the Spark twin of the reference's
golden-file minifier tests (internal/jsonminify/jsonminify_test.go),
strengthened from examples to properties."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from eventlog_spark.validation import (
    MAX_LABEL_LEN,
    minify_json,
    validate_label,
    validate_payload,
)

json_values = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**53), max_value=2**53)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=20),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=10), children, max_size=4),
    max_leaves=10,
)

nonempty_objects = st.dictionaries(
    st.text(max_size=10), json_values, min_size=1, max_size=5
)


@settings(max_examples=200, deadline=None)
@given(nonempty_objects, st.sampled_from([0, 2, 4]))
def test_minify_preserves_value_and_strips_whitespace(obj, indent):
    """Minified payload parses to the same value, and contains no
    whitespace outside string literals (the reference contract:
    whitespace-only minification, jsonminify.go:3-25)."""
    pretty = json.dumps(obj, indent=indent or None)
    mini = minify_json(pretty)
    assert json.loads(mini) == obj
    # strip all string literals, then no whitespace may remain
    in_string = False
    escaped = False
    outside = []
    for ch in mini:
        if in_string:
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == '"':
                in_string = False
        elif ch == '"':
            in_string = True
        else:
            outside.append(ch)
    assert not any(c in " \t\n\r" for c in outside)


@settings(max_examples=200, deadline=None)
@given(nonempty_objects)
def test_minify_idempotent(obj):
    mini = minify_json(json.dumps(obj, indent=2))
    assert minify_json(mini) == mini


@settings(max_examples=200, deadline=None)
@given(nonempty_objects)
def test_valid_objects_accepted(obj):
    validate_payload(json.dumps(obj))


@settings(max_examples=100, deadline=None)
@given(json_values)
def test_non_objects_rejected(value):
    """Scalars, arrays, null — everything that isn't a non-empty object
    — must be rejected (reference truth table, eventlog_test.go:520-538)."""
    from eventlog_spark.errors import InvalidPayload

    if isinstance(value, dict) and value:
        return  # valid case, covered above
    try:
        validate_payload(json.dumps(value))
        raised = False
    except InvalidPayload:
        raised = True
    assert raised


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz_-.~%", max_size=MAX_LABEL_LEN))
def test_valid_labels_accepted(label):
    validate_label(label)


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=1, max_size=32).filter(lambda s: any(c not in "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz_-.~%" for c in s)))
def test_invalid_label_charset_rejected(label):
    from eventlog_spark.errors import InvalidLabel

    try:
        validate_label(label)
        raised = False
    except InvalidLabel:
        raised = True
    assert raised
