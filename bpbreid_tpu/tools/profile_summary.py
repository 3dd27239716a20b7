"""Op-level summary of a jax.profiler trace (xplane protobuf).

The TPU-native replacement for "read the torch profiler table": point it
at the ``plugins/profile/<run>/*.xplane.pb`` file a
``jax.profiler.trace`` / ``utils.writer.ProfilerTrace`` context wrote
(or at the directory containing it) and it prints per-op device time
aggregated by fusion name plus a category rollup (convolution / reduce /
elementwise / copy ...), so "where does the step time go" is answerable
without a TensorBoard install.  Reference observability analogue:
torchreid's CUDA-event timing table (utils/avgmeter.py:240-283,
writer.py:373-391) — this goes one level deeper, to XLA ops.

Usage:
  python -m bpbreid_tpu.tools.profile_summary <trace-dir-or-xplane.pb> \
      [--top 30] [--plane tpu]
"""
import argparse
import collections
import glob
import os.path as osp
import re


def find_xplane(path):
    """Resolve a trace directory (as passed to start_trace) or a direct
    .xplane.pb path to the newest xplane file under it."""
    if osp.isfile(path):
        return path
    hits = sorted(glob.glob(osp.join(path, '**', '*.xplane.pb'),
                            recursive=True), key=osp.getmtime)
    if not hits:
        raise FileNotFoundError(
            'no *.xplane.pb under {!r} — pass the directory given to '
            'jax.profiler.start_trace (or ProfilerTrace)'.format(path))
    return hits[-1]


# crude-but-useful buckets for XLA fusion/op names on TPU.
# Order matters: control flow first (their duration covers their whole
# body and would double-count the children), then reduces BEFORE convs
# ('%convert_reduce_fusion' must not be caught by a 'conv' pattern).
_CATEGORIES = (
    ('control-flow', re.compile(r'%while|%conditional|%call|%fusion\.\d+ = '
                                r'\(.*\) while')),
    ('reduce', re.compile(r'reduce|all-reduce|allreduce')),
    ('convolution', re.compile(r'convolution|%conv\b|conv[0-9._]')),
    ('matmul', re.compile(r'\bdot\b|dot_general|einsum')),
    ('scatter/gather', re.compile(r'scatter|gather|dynamic-slice|'
                                  r'dynamic_slice|take')),
    ('copy/transpose', re.compile(r'copy|transpose|reshape|bitcast|%pad|'
                                  r'concatenate')),
    ('infeed/outfeed', re.compile(r'infeed|outfeed|send|recv')),
)

# '%name = type opcode(' — the head of a full HLO definition string as
# it appears in trace event names
_DEF_RE = re.compile(r'^\s*(%[\w.\-]+)\s*=\s*\S.*?\s([a-z][\w\-]*)\(')

_OPCODE_CAT = {
    'while': 'control-flow', 'conditional': 'control-flow',
    'call': 'control-flow',
    'convolution': 'convolution',
    'dot': 'matmul',
    'reduce': 'reduce', 'reduce-window': 'reduce',
    'all-reduce': 'reduce', 'reduce-scatter': 'reduce',
    'copy': 'copy/transpose', 'copy-start': 'copy/transpose',
    'copy-done': 'copy/transpose', 'transpose': 'copy/transpose',
    'reshape': 'copy/transpose', 'bitcast': 'copy/transpose',
    'pad': 'copy/transpose', 'concatenate': 'copy/transpose',
    'gather': 'scatter/gather', 'scatter': 'scatter/gather',
    'dynamic-slice': 'scatter/gather',
    'dynamic-update-slice': 'scatter/gather',
    'infeed': 'infeed/outfeed', 'outfeed': 'infeed/outfeed',
    'send': 'infeed/outfeed', 'recv': 'infeed/outfeed',
}


def _match_patterns(text):
    for cat, pat in _CATEGORIES:
        if pat.search(text):
            return cat
    return 'elementwise/other'


def categorize(name):
    """Bucket one trace event.

    Event names are full HLO definition strings — operand lists and
    ``calls=%...`` references included — so pattern-matching the WHOLE
    text misfiles ops by their operands (a quantize fusion whose weight
    operand is a ``%bitcast_fusion`` is not a copy). Parse the
    definition head instead: the OPCODE decides when it is specific
    (``convolution``, ``while``, ``copy``...), and for ``fusion`` ops —
    whose payload the opcode does not reveal — only the fusion's own
    NAME is matched against the patterns (XLA names fusions by their
    root: ``%convert_reduce_fusion`` -> reduce,
    ``%clamp_convert_fusion`` -> elementwise epilogue, plain
    ``%fusion.N`` -> whatever the name hints give, else
    elementwise/other)."""
    low = name.lower()
    m = _DEF_RE.match(low)
    if not m:
        return _match_patterns(low)
    opname, opcode = m.group(1), m.group(2)
    if opcode in _OPCODE_CAT:
        return _OPCODE_CAT[opcode]
    hinted = _match_patterns(opname)
    if opcode == 'fusion' and hinted == 'elementwise/other':
        # a fusion whose name carries no hint usually wraps the real
        # work (TPU kOutput fusions put the convolution INSIDE with its
        # epilogue — e.g. the int8 graph's clamp_convert fusions);
        # calling that "elementwise" would hide where the FLOPs are
        return 'fusion/mixed (conv+epilogue etc.)'
    return hinted


def pick_plane(profile, prefer):
    """Pick the device plane: prefer TPU, else GPU, else host."""
    planes = list(profile.planes)
    ranked = []
    for plane in planes:
        low = plane.name.lower()
        if prefer and prefer in low:
            score = 3
        elif 'tpu' in low or 'device' in low:
            score = 2
        elif 'gpu' in low:
            score = 1
        else:
            score = 0
        ranked.append((score, plane))
    ranked.sort(key=lambda t: t[0], reverse=True)
    return ranked[0][1] if ranked else None


def pick_lines(plane):
    """Select the event lines to aggregate, avoiding double counting.

    A device plane carries parallel lines for the SAME time span at
    different granularities ('XLA Modules' = whole jit programs,
    'XLA Ops' = per-op, 'Async XLA Ops' = duplicated async views,
    'Steps', ...). Summing every line counts the same nanoseconds two
    or three times and files jit_* module names under
    'elementwise/other'. Aggregate only the op-level line when one
    exists; otherwise fall back to all lines (host planes etc. — their
    nested-event totals are indicative only).
    """
    op_lines = [l for l in plane.lines if l.name == 'XLA Ops']
    return (op_lines, True) if op_lines else (list(plane.lines), False)


def summarize(xplane_path, top=30, prefer='tpu'):
    """Return ``(rows, cat_totals, total_ns, plane_name)``: ``rows`` are
    ``(name, total_ns, count)`` tuples sorted by device time descending
    (nanoseconds), ``cat_totals`` a Counter of category -> ns, and
    ``total_ns`` the summed op time. Only the plane's op-level
    'XLA Ops' line is aggregated (see pick_lines)."""
    from jax.profiler import ProfileData
    profile = ProfileData.from_file(xplane_path)
    plane = pick_plane(profile, prefer)
    if plane is None:
        raise RuntimeError('trace has no planes: ' + xplane_path)
    lines, op_level = pick_lines(plane)
    per_op = collections.Counter()
    counts = collections.Counter()
    for line in lines:
        for event in line.events:
            name = event.name
            dur = event.duration_ns
            per_op[name] += dur
            counts[name] += 1
    rows = [(name, ns, counts[name]) for name, ns in per_op.most_common()]
    cat = collections.Counter()
    total = 0
    for name, ns, _ in rows:
        c = categorize(name)
        # a while/cond op's duration covers its whole body, and the body
        # ops are reported separately on the same line — counting both
        # would ~double the total; roll up the leaves only
        if c == 'control-flow':
            continue
        cat[c] += ns
        total += ns
    label = plane.name if op_level else plane.name + ' (all lines; nested)'
    return rows[:top], cat, total, label


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('path', help='trace dir or .xplane.pb file')
    parser.add_argument('--top', type=int, default=30)
    parser.add_argument('--plane', default='tpu',
                        help='substring preference for the plane name')
    args = parser.parse_args(argv)

    xplane = find_xplane(args.path)
    rows, cats, total_ns, plane_name = summarize(
        xplane, top=args.top, prefer=args.plane)
    print('plane: {}   total event time: {:.3f} ms'.format(
        plane_name, total_ns / 1e6))
    print('\n-- category rollup --')
    for cat, ns in cats.most_common():
        print('{:<20} {:>10.3f} ms  {:>5.1f}%'.format(
            cat, ns / 1e6, 100.0 * ns / max(total_ns, 1)))
    print('\n-- top {} ops by device time --'.format(len(rows)))
    print('{:<64} {:>10} {:>7}'.format('op', 'ms', 'count'))
    for name, ns, count in rows:
        print('{:<64} {:>10.3f} {:>7}'.format(
            name[:64], ns / 1e6, count))


if __name__ == '__main__':
    main()
