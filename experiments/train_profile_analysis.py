"""Deep-dive on the train-step trace: aggregate XLA Ops by op family and
by output shape to find where the 93 ms/step goes."""
import collections
import re
import sys

from bpbreid_tpu.tools.profile_summary import find_xplane, pick_plane, categorize


def main(path):
    from jax.profiler import ProfileData
    profile = ProfileData.from_file(find_xplane(path))
    plane = pick_plane(profile, 'tpu')
    lines = [l for l in plane.lines if l.name == 'XLA Ops']
    per_op = collections.Counter()
    counts = collections.Counter()
    for line in lines:
        for ev in line.events:
            per_op[ev.name] += ev.duration_ns
            counts[ev.name] += 1

    # family = op name without the %/index; shape = first output shape
    fam = collections.Counter()
    n_steps = 24.0
    total = 0
    for name, ns in per_op.items():
        if categorize(name) == 'control-flow':
            continue
        total += ns
        m = re.match(r'%([a-z_\-]+)', name)
        f = m.group(1).rstrip('._') if m else name[:24]
        fam[f] += ns
    print('leaf total: {:.1f} ms/step over {} steps'.format(
        total / 1e6 / n_steps, int(n_steps)))
    print('\n-- by op family (ms/step) --')
    for f, ns in fam.most_common(25):
        print('{:<42} {:>8.3f}'.format(f, ns / 1e6 / n_steps))

    # all convert_reduce rows: these are the BN stat/grad reductions
    cr = [(name, ns) for name, ns in per_op.items()
          if 'convert_reduce' in name or
          (categorize(name) == 'reduce')]
    cr_total = sum(ns for _, ns in cr)
    print('\n-- reduce-family rows: {} ops, {:.2f} ms/step --'.format(
        len(cr), cr_total / 1e6 / n_steps))
    # group by output channel width
    bych = collections.Counter()
    for name, ns in cr:
        m = re.search(r'= \(?(bf16|f32|s32)\[(\d+)\]', name)
        key = m.group(2) if m else '??'
        bych['c' + key] += ns
    for k, ns in bych.most_common(12):
        print('  {:<10} {:>8.3f} ms/step'.format(k, ns / 1e6 / n_steps))

    # big-tensor ops: anything whose name mentions a >=100MB f32 shape
    print('\n-- ops touching full-res [.,384,...] tensors --')
    big = [(n, ns) for n, ns in per_op.items() if ',384,' in n or ',404,' in n]
    print('  {} ops, {:.2f} ms/step'.format(
        len(big), sum(ns for _, ns in big) / 1e6 / n_steps))
    for n, ns in sorted(big, key=lambda t: -t[1])[:12]:
        print('  {:<70} {:>7.3f}'.format(n[:70], ns / 1e6 / n_steps))


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/train_trace')
