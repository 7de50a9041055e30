"""Property-based coverage proof for the spool consumer's offset math
(sources/kafka_spool.py): for ANY segment layout and ANY poll-budget
sequence, the union of poll slices covers every record exactly once and
offsets advance monotonically — the exactly-once invariant the
consume loop relies on."""

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from geowave_ray.sources import kafka_spool as ks


@given(
    st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=8),
    st.lists(st.integers(min_value=1, max_value=11), min_size=1, max_size=30),
)
@settings(max_examples=60, deadline=None)
def test_poll_slices_cover_exactly_once(tmp_path_factory, seg_sizes, budgets):
    tmp = tmp_path_factory.mktemp("topic")
    topic = str(tmp)
    ks_idx = 0
    for size in seg_sizes:
        with ks.SpoolProducer(topic, records_per_segment=size) as p:
            for _ in range(size):
                p.send_file(f"f{ks_idx}", b"x")
                ks_idx += 1
    total = sum(seg_sizes)
    off = {"segment_seq": 0, "record": 0, "polls": 0}
    seen: list[tuple[str, int]] = []
    prev = (0, 0)
    for b in budgets:
        slices, off = ks.poll(topic, off, max_records=b)
        for seg, s, e in slices:
            assert 0 <= s < e
            for r in range(s, e):
                seen.append((os.path.basename(seg), r))
        cur = (off["segment_seq"], off["record"])
        assert cur >= prev  # offsets never move backwards
        prev = cur
        if not slices:
            break
    # drain whatever the random budgets left
    slices, off = ks.poll(topic, off, max_records=None)
    for seg, s, e in slices:
        for r in range(s, e):
            seen.append((os.path.basename(seg), r))
    assert len(seen) == total  # every record exactly once
    assert len(set(seen)) == total  # no duplicates
    # terminal state: one past the last segment
    assert off["segment_seq"] == len(
        [x for x in os.listdir(topic) if x.endswith(".avro")]
    )
    assert off["record"] == 0
    # an exhausted topic polls empty forever
    slices, off2 = ks.poll(topic, off, max_records=5)
    assert slices == [] and (off2["segment_seq"], off2["record"]) == (
        off["segment_seq"], off["record"],
    )
