"""Byte-level BPE tokenizer with a vendored merge table.

The algorithm is the public byte-pair-encoding of Sennrich et al. 2016
("Neural Machine Translation of Rare Words with Subword Units"), in the
byte-level form popularized by GPT-2: the base vocabulary is the 256
byte values, and merges are learned greedily by adjacent-pair frequency
over a training corpus, then applied lowest-rank-first at encode time.

No network and no third-party vocab file exist in this environment, so
the merge table is TRAINED deterministically from the embedded seed
corpus below (common English function words + the corpus domain
vocabulary) and COMMITTED at ``spider_ray/core/bpe_merges.txt`` — a
vendored artifact, exactly like shipping a tokenizer file.  Regenerate
after a seed/spec change with::

    python -m spider_ray.core.bpe        # rewrites bpe_merges.txt

Determinism: ties in pair frequency break on the lexicographically
smallest ``(left_bytes, right_bytes)`` pair, so training is a pure
function of the seed text and merge count.  ``tests/test_bpe.py``
retrains from scratch and fails if the committed table is stale.

Encoding state (the rank table) is built once per actor in the pipeline
stages' ``__init__`` — never per batch.
"""

from __future__ import annotations

import os
import re
from collections import Counter

_HERE = os.path.dirname(os.path.abspath(__file__))
MERGES_PATH = os.path.join(_HERE, "bpe_merges.txt")
N_MERGES = 384

# Pre-tokenizer: same \S+ word definition as the regex chunker
# (pipelines/textstats.py CHUNK_TOKENS family) so the two chunking
# operators differ only in the within-word token granularity.
_WORD_RE = re.compile(r"\S+")

# Seed corpus: common English function words/affix carriers plus the
# synthetic documents table's domain vocabulary (TESTDATA.md), each
# line repeated by rough expected frequency during training.
_SEED_LINES: list[tuple[int, str]] = [
    (8, "the and for are but not you all can had her was one our out"),
    (6, "this that with have from they will been were said each which"),
    (4, "there their would about other into more some could them these"),
    (4, "ing ed er est tion ness ment able ful less ly un re pre over"),
    (8, "the fast key order sort table scan merge part window small hash"),
    (8, "scan join order batch stream spark window dup group filter row"),
    (6, "query value vector column customer data line agg big slow a"),
    (2, "lorem ipsum dolor amet crawl spider frontier domain politeness"),
    (2, "robots parse fetch queue page link depth round shard arrow"),
]


def seed_corpus() -> str:
    return "\n".join(line for rep, line in _SEED_LINES for _ in range(rep))


def train_bpe(text: str, n_merges: int = N_MERGES) -> list[tuple[bytes, bytes]]:
    """Greedy BPE training: count whitespace words once, then repeatedly
    merge the most frequent adjacent symbol pair (ties: smallest pair
    bytes).  Symbols are byte strings; base alphabet is raw bytes."""
    word_freq = Counter(_WORD_RE.findall(text))
    # each distinct word -> list of single-byte symbols
    words: list[tuple[list[bytes], int]] = [
        ([bytes([b]) for b in w.encode("utf-8")], f)
        for w, f in sorted(word_freq.items())
    ]
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[bytes, bytes]] = Counter()
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], [-c for c in kv[0][0] + kv[0][1]]))
        # deterministic tie-break: highest count, then lexicographically
        # smallest concatenated pair bytes (the negated-byte key above)
        pair, count = best
        if count < 2:
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    syms[i: i + 2] = [merged]
                else:
                    i += 1
    return merges


def train_bpe_from_counts(
    word_counts: list[tuple[str, int]], n_merges: int,
) -> list[tuple[bytes, bytes, int]]:
    """BPE training over a pre-aggregated (word, count) vocabulary —
    the corpus-scale entry point (pipelines/textstats.train_bpe_vocab
    computes the counts distributively; this merge loop is vocab-sized,
    never corpus-sized).

    Spec (mirrored by the independent naive twin in goldens.py —
    change BOTH or neither):

    * pair frequency counts adjacent symbol pairs with overlap
      (``zip(syms, syms[1:])``), weighted by word count;
    * each round merges the highest-count pair, ties broken on the
      lexicographically smallest ``(left, right)`` byte tuple;
    * a merge is applied left-to-right, non-overlapping (after a
      replacement the scan re-checks the same index);
    * stop when the best pair's count is < 2 or after ``n_merges``.

    Returns ``(left, right, count_at_merge_time)`` triples.

    Unlike the seed-corpus trainer above (full pair recount per round,
    fine for a 9-line seed), this is INCREMENTAL: a pair -> word-index
    posting map limits each round's recount to the words that actually
    contain the merged pair, so a round costs O(words containing the
    pair), not O(vocabulary)."""
    words: list[list[bytes]] = []
    freqs: list[int] = []
    for w, f in word_counts:
        words.append([bytes([b]) for b in w.encode("utf-8")])
        freqs.append(int(f))

    def word_pairs(syms: list[bytes]) -> Counter:
        c: Counter = Counter()
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += 1
        return c

    pair_counts: Counter = Counter()
    posting: dict[tuple[bytes, bytes], set[int]] = {}
    for wi, (syms, f) in enumerate(zip(words, freqs)):
        for p, k in word_pairs(syms).items():
            pair_counts[p] += k * f
            posting.setdefault(p, set()).add(wi)

    merges: list[tuple[bytes, bytes, int]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # highest count, then smallest (left, right) byte pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), count = best
        if count < 2:
            break
        merges.append((left, right, count))
        merged = left + right
        for wi in sorted(posting.get((left, right), ())):
            syms, f = words[wi], freqs[wi]
            before = word_pairs(syms)
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i: i + 2] = [merged]
                else:
                    i += 1
            after = word_pairs(syms)
            for p in before.keys() | after.keys():
                d = after.get(p, 0) - before.get(p, 0)
                if d:
                    pair_counts[p] += d * f
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                if after.get(p, 0):
                    posting.setdefault(p, set()).add(wi)
                elif p in posting:
                    posting[p].discard(wi)
        posting.pop((left, right), None)
        pair_counts.pop((left, right), None)
    return merges


def save_merges(merges: list[tuple[bytes, bytes]], path: str = MERGES_PATH) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("# spider_ray vendored BPE merge table — regenerate with"
                " `python -m spider_ray.core.bpe`\n")
        for a, b in merges:
            f.write(f"{a.hex()} {b.hex()}\n")


def load_merges(path: str = MERGES_PATH) -> list[tuple[bytes, bytes]]:
    merges = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            a, b = line.split()
            merges.append((bytes.fromhex(a), bytes.fromhex(b)))
    return merges


class Bpe:
    """Encoder over a fixed merge table.  Build ONCE per actor
    (__init__ of the pipeline stage); ``encode`` is then pure."""

    def __init__(self, merges: list[tuple[bytes, bytes]] | None = None):
        self.merges = load_merges() if merges is None else merges
        self.ranks: dict[tuple[bytes, bytes], int] = {
            p: i for i, p in enumerate(self.merges)
        }
        self._word_cache: dict[str, int] = {}

    def encode_word(self, word: str) -> list[bytes]:
        """Apply merges lowest-rank-first to one pre-token."""
        syms = [bytes([b]) for b in word.encode("utf-8")]
        ranks = self.ranks
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i: best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    def n_tokens_word(self, word: str) -> int:
        """Token count of one word, memoized — the corpora repeat a
        small word vocabulary heavily, so the cache turns encoding
        into a dict lookup on the hot path.  Bounded: web text is
        remote-controlled, and an adversarial stream of unique words
        would otherwise grow a long-lived actor's cache without limit
        (long words are also the least likely to repeat, so they skip
        the cache entirely)."""
        if len(word) > 64:
            return len(self.encode_word(word))
        cache = self._word_cache
        n = cache.get(word)
        if n is None:
            if len(cache) >= 1_000_000:
                cache.clear()  # crude but safe: refill from live data
            n = len(self.encode_word(word))
            cache[word] = n
        return n

    def encode(self, text: str) -> list[bytes]:
        out: list[bytes] = []
        for w in _WORD_RE.findall(text):
            out.extend(self.encode_word(w))
        return out


if __name__ == "__main__":
    m = train_bpe(seed_corpus())
    save_merges(m)
    print(f"wrote {len(m)} merges -> {MERGES_PATH}")
