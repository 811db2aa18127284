"""De Bruijn contig assembly for active regions that lack spanning reads.

Reference: assembly/IterativeAssembler.{hh,cpp} + SmallAssembler —
iterative word sizes, min k-mer coverage, greedy highest-coverage walk.
Host-side by design: assembly triggers only for regions <=250bp that
counting can't handle (ActiveRegionProcessor.hh:48-57), so it is rare
and cheap relative to the device hot loop.
"""
from __future__ import annotations

from collections import Counter, defaultdict

MIN_WORD_SIZE = 20        # IterativeAssemblerOptions minWordLength
MAX_WORD_SIZE = 76        # maxWordLength
WORD_SIZE_STEP = 5
MIN_COVERAGE = 3          # minCoverage
MAX_CONTIG_COUNT = 10


def assemble_region(read_seqs: list[str], min_seed_count: int = MIN_COVERAGE):
    """Assemble contigs from read substrings; returns list of
    (contig, support_count) sorted by support."""
    for k in range(MIN_WORD_SIZE, MAX_WORD_SIZE + 1, WORD_SIZE_STEP):
        contigs = _assemble_at_k(read_seqs, k, min_seed_count)
        if contigs:
            # repeat check: a contig that revisits a k-mer means k too
            # small; try larger word size
            ok = True
            for c, _ in contigs:
                kmers = [c[i:i + k] for i in range(len(c) - k + 1)]
                if len(kmers) != len(set(kmers)):
                    ok = False
                    break
            if ok:
                return contigs
    return []


def _assemble_at_k(read_seqs: list[str], k: int, min_count: int):
    counts: Counter = Counter()
    read_support: defaultdict[str, set] = defaultdict(set)
    for ridx, seq in enumerate(read_seqs):
        if len(seq) < k:
            continue
        seen = set()
        for i in range(len(seq) - k + 1):
            w = seq[i:i + k]
            if "N" in w:
                continue
            counts[w] += 1
            if w not in seen:
                read_support[w].add(ridx)
                seen.add(w)
    if not counts:
        return []
    alive = {w for w, c in counts.items() if c >= min_count}
    if not alive:
        return []

    def extend(word, forward: bool):
        path = []
        seen = {word}
        cur = word
        while True:
            best = None
            best_c = 0
            for b in "ACGT":
                nxt = cur[1:] + b if forward else b + cur[:-1]
                c = counts.get(nxt, 0)
                if nxt in alive and nxt not in seen and c > best_c:
                    best, best_c = nxt, c
            if best is None:
                break
            path.append(best[-1] if forward else best[0])
            seen.add(best)
            cur = best
        return "".join(path)

    contigs = []
    used = set()
    for seed in sorted(alive, key=lambda w: -counts[w]):
        if seed in used:
            continue
        right = extend(seed, True)
        left = extend(seed, False)
        contig = left[::-1] + seed + right
        # mark k-mers of the contig as used
        support = set()
        for i in range(len(contig) - k + 1):
            w = contig[i:i + k]
            used.add(w)
            support |= read_support.get(w, set())
        contigs.append((contig, len(support)))
        if len(contigs) >= MAX_CONTIG_COUNT:
            break
    contigs.sort(key=lambda x: -x[1])
    return contigs
