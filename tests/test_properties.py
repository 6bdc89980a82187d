"""Property-based tests (hypothesis) — SURVEY.md §5.2 item 4:
sniff+parse round-trips under random delimiters/content; sync decision
under random column-set mutations. Pure driver-side properties (no
SparkSession) so thousands of cases run in seconds."""

import csv
import io

from hypothesis import given, settings
from hypothesis import strategies as st

from excel_to_database_spark.naming import sanitize_columns, sqlify, to_alnum
from excel_to_database_spark.sources.csv_sniff import sniff_delimiter
from excel_to_database_spark.sources.payload import list_to_matrix
from excel_to_database_spark.sources.xlsx_core import a1_to_rowcol, serial_to_iso
from excel_to_database_spark.sync.policy import SyncAction, decide_sync_action

# cell content free of delimiter/quote/newline chars
_cell = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
    min_size=1,
    max_size=8,
)


@settings(max_examples=200)
@given(
    delim=st.sampled_from([",", ";", "|", "\t"]),
    rows=st.lists(st.lists(_cell, min_size=2, max_size=6), min_size=2, max_size=12),
)
def test_sniffer_recovers_delimiter_on_rectangular_data(delim, rows):
    width = len(rows[0])
    rect = [(r * width)[:width] for r in rows]  # rectangularize
    text = "\n".join(delim.join(r) for r in rect)
    sniffed = sniff_delimiter(text)
    # the sniffed delimiter must re-parse to the same rectangle width
    parsed = list(csv.reader(io.StringIO(text), delimiter=sniffed))
    assert all(len(p) == len(parsed[0]) for p in parsed)
    if width > 1:
        assert sniffed == delim


@settings(max_examples=200)
@given(st.lists(st.text(max_size=12), min_size=1, max_size=10))
def test_sanitize_columns_unique_nonempty(cols):
    out = sanitize_columns(cols)
    assert len(out) == len(cols)
    assert len(set(out)) == len(out)
    assert all(c and all(ch.isalnum() or ch == "_" for ch in c) for c in out)


@settings(max_examples=200)
@given(st.text(max_size=30))
def test_naming_idempotent(s):
    assert to_alnum(to_alnum(s)) == to_alnum(s)
    assert sqlify(sqlify(s)) == sqlify(s)


@settings(max_examples=200)
@given(
    existing=st.lists(_cell, min_size=1, max_size=8, unique_by=str.lower),
    incoming=st.lists(_cell, min_size=1, max_size=8, unique_by=str.lower),
)
def test_sync_decision_properties(existing, incoming):
    action = decide_sync_action(existing, incoming)
    same_set = sorted(c.lower() for c in existing) == sorted(c.lower() for c in incoming)
    assert action is (SyncAction.TRUNCATE if same_set else SyncAction.RECREATE)
    # permutation invariance of the incoming header
    assert decide_sync_action(existing, list(reversed(incoming))) is action


@settings(max_examples=200)
@given(st.integers(min_value=1, max_value=200000))
def test_serial_date_monotonic(serial):
    a, b = serial_to_iso(serial), serial_to_iso(serial + 1)
    assert a < b  # ISO strings order like dates


@settings(max_examples=200)
@given(st.integers(min_value=0, max_value=2000), st.integers(min_value=0, max_value=500))
def test_a1_roundtrip(row, col):
    letters = ""
    c = col + 1
    while c:
        c, rem = divmod(c - 1, 26)
        letters = chr(65 + rem) + letters
    assert a1_to_rowcol(f"{letters}{row + 1}") == (row, col)


@settings(max_examples=200)
@given(
    flat=st.lists(st.integers(), min_size=0, max_size=40),
    n_cols=st.integers(min_value=1, max_value=8),
)
def test_list_to_matrix_preserves_cells(flat, n_cols):
    m = list_to_matrix(flat, n_cols)
    assert [c for row in m for c in row] == flat
    assert all(len(r) == n_cols for r in m[:-1])




# --- minimal protobuf runtime wire-format properties (streaming/_pbshim) ---

def _state_message_module():
    from excel_to_database_spark.streaming.tws import ensure_protobuf

    assert ensure_protobuf()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


@settings(max_examples=300, deadline=None)
@given(
    payload=st.binary(max_size=300),
    name=st.text(max_size=60),
    schema=st.text(max_size=60),
    code=st.integers(min_value=-(2**31), max_value=2**31 - 1),
)
def test_pbshim_roundtrips_arbitrary_field_values(payload, name, schema, code):
    """The vendored wire codec must round-trip arbitrary bytes
    (including NULs and >0x7F), arbitrary unicode strings (multi-byte
    UTF-8), and full-range int32 (negative statusCode encodes as a
    10-byte varint) through nested messages and oneofs."""
    sm = _state_message_module()
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(
                stateName=name,
                valueStateUpdate=sm.ValueStateUpdate(value=payload),
            )
        )
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    call = back.stateVariableRequest.valueStateCall
    assert call.stateName == name
    assert call.valueStateUpdate.value == payload
    assert back.WhichOneof("method") == "stateVariableRequest"

    resp = sm.StateResponse(statusCode=code, errorMessage=schema, value=payload)
    r2 = sm.StateResponse()
    r2.ParseFromString(resp.SerializeToString())
    assert (r2.statusCode, r2.errorMessage, r2.value) == (code, schema, payload)


@settings(max_examples=200, deadline=None)
@given(values=st.lists(st.binary(max_size=100), max_size=20),
       more=st.booleans())
def test_pbshim_repeated_bytes_roundtrip(values, more):
    """Repeated bytes fields (the list-state fetch payload) keep order,
    count, and content — including empty elements and empty lists."""
    sm = _state_message_module()
    msg = sm.StateResponseWithListGet(
        statusCode=0, value=values, requireNextFetch=more
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(msg.SerializeToString())
    assert back.value == values
    assert back.requireNextFetch is more


@settings(max_examples=200, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.binary(max_size=50), st.binary(max_size=50)), max_size=15
))
def test_pbshim_repeated_message_roundtrip(pairs):
    """Repeated sub-messages (the map-state KeyAndValuePair page) —
    nested length-delimited framing round-trips every element."""
    sm = _state_message_module()
    msg = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[sm.KeyAndValuePair(key=k, value=v) for k, v in pairs],
        requireNextFetch=False,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(msg.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == pairs


@settings(max_examples=300, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)), max_size=60
    )
)
def test_union_find_matches_naive_closure(edges):
    """The driver-side union-find behind incremental dedup clusters
    (operators/dedup._UnionFind) must produce min-label components
    identical to a naive transitive closure, for any union order."""
    from excel_to_database_spark.operators.dedup import _UnionFind

    uf = _UnionFind()
    for a, b in edges:
        uf.union(a, b)

    # naive reference: propagate min labels to fixpoint
    nodes = {n for e in edges for n in e}
    label = {n: n for n in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(label[a], label[b])
            if label[a] != m or label[b] != m:
                label[a] = label[b] = m
                changed = True
    assert {n: uf.find(n) for n in nodes} == label


def test_pbshim_submessage_vivifies_on_write_not_read():
    """Real-protobuf mutation semantics: ``msg.sub.field = x`` through
    a chain of unset sub-messages must be visible to serialization
    (lazy vivification with parent-notify), while a mere READ of an
    unset sub-message must NOT mark it present (HasField/WhichOneof/
    wire bytes unchanged)."""
    sm = _state_message_module()

    # read-only access: no presence, no wire bytes
    req = sm.StateRequest()
    _ = req.stateVariableRequest.valueStateCall.stateName
    assert not req.HasField("stateVariableRequest")
    assert req.WhichOneof("method") is None
    assert req.SerializeToString() == b""

    # write through two lazy levels: surfaces on the wire
    req2 = sm.StateRequest()
    req2.stateVariableRequest.valueStateCall.stateName = "s1"
    assert req2.HasField("stateVariableRequest")
    assert req2.WhichOneof("method") == "stateVariableRequest"
    back = sm.StateRequest()
    back.ParseFromString(req2.SerializeToString())
    assert back.stateVariableRequest.valueStateCall.stateName == "s1"

    # repeated append through a lazy chain surfaces too
    it = sm.StateResponseWithMapIterator()
    it.kvPair.append(sm.KeyAndValuePair(key=b"k", value=b"v"))
    back2 = sm.StateResponseWithMapIterator()
    back2.ParseFromString(it.SerializeToString())
    assert [(p.key, p.value) for p in back2.kvPair] == [(b"k", b"v")]

    # CopyFrom into a lazily obtained sub-message attaches it
    req3 = sm.StateRequest()
    req3.stateVariableRequest.CopyFrom(req2.stateVariableRequest)
    assert req3.HasField("stateVariableRequest")
    assert req3.SerializeToString() == req2.SerializeToString()
