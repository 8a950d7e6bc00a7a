"""Byte-pair-encoding tokenizer: bounded training + distributed apply.

The real token-counting stage of a training-data pipeline (the
regex/whitespace counters in datapipe.textstats are calibration
heuristics; this is an actual learned subword vocabulary):

- ``bpe_train`` fits merge rules on a DETERMINISTIC bounded sample of
  the corpus (content-hash sampling, driver-side frequency tables —
  the same bounded-fit pattern as the IVF coarse quantizer: training
  data is capped, the corpus itself never leaves the cluster).
- ``bpe_tokenize`` applies the learned merges corpus-wide in an
  Arrow-batched ``mapInPandas`` kernel — embarrassingly parallel, one
  scan, no shuffle.

Algorithm is the classic word-level BPE (Sennrich et al. 2016,
public): words split to characters + end-of-word marker; repeatedly
merge the most frequent adjacent pair (ties broken lexicographically
so training is deterministic across runs and platforms).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cubert_spark.datapipe.sampling import hash16

_EOW = "</w>"


def _word_freqs(texts: list[str]) -> Counter:
    wf: Counter = Counter()
    for t in texts:
        for w in t.split():
            wf[w] += 1
    return wf


def bpe_train(
    df: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_max_docs: int = 10_000,
    salt: str = "bpe",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from a bounded,
    deterministically-sampled slice of the corpus. Returns the ordered
    merge list (the tokenizer model). Driver memory is bounded by
    ``sample_max_docs`` documents' vocabulary, never the corpus."""
    n = df.count()
    frac = min(1.0, sample_max_docs / max(n, 1))
    sample = df.select(text_col) if frac >= 1.0 else df.select(text_col, id_col).filter(
        hash16(F.col(id_col), salt) < int(frac * (1 << 16))
    ).select(text_col)
    texts = [r[0] for r in sample.limit(sample_max_docs).collect() if r[0]]
    return bpe_train_texts(texts, num_merges)


def bpe_train_texts(texts: list[str], num_merges: int = 200) -> list[tuple[str, str]]:
    """The driver-side BPE fit over an in-memory text sample — the
    core of :func:`bpe_train`, exposed so fixed tokenizer models (e.g.
    the oracle twin's literal merge list) can be trained from an
    embedded corpus without a SparkSession."""
    wf = _word_freqs(texts)
    # word -> symbol tuple
    words = {w: tuple(w) + (_EOW,) for w in wf}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            f = wf[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # most frequent pair, ties to the lexicographically smallest —
        # deterministic regardless of dict order
        cnt = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == cnt)
        if cnt < 2:
            break  # nothing left that generalizes
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_words = {}
        for w, syms in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word (greedy lowest-rank-first — the
    standard BPE inference order)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode_text(text: str, merges: list[tuple[str, str]]) -> list[str]:
    ranks = {p: i for i, p in enumerate(merges)}
    out: list[str] = []
    for w in text.split():
        out.extend(bpe_encode_word(w, ranks))
    return out


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a trained merge list. Output:
    (id, tokens array<string>, n_tokens). One scan, no shuffle; the
    merge table broadcasts inside the serialized kernel closure
    (tokenizer models are KBs, not GBs)."""
    from collections.abc import Iterator

    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            rows = []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in ("" if text is None else text).split():
                    got = cache.get(w)
                    if got is None:
                        got = bpe_encode_word(w, ranks)
                        if len(cache) < 200_000:  # bounded per-task memo
                            cache[w] = got
                    toks.extend(got)
                rows.append({id_col: int(i), "tokens": toks, "n_tokens": len(toks)})
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, schema=f"{id_col} long, tokens array<string>, n_tokens int"
    )


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Persist a trained merge list as the standard ``merges.txt``
    format (one space-separated pair per line, rank = line order —
    interchangeable with GPT-2-style tokenizer tooling). Symbols never
    contain whitespace by construction (words are whitespace-split),
    so the format is unambiguous."""
    with open(path, "w", encoding="utf-8") as f:
        for a, b in merges:
            f.write(f"{a} {b}\n")


def load_merges(path: str) -> list[tuple[str, str]]:
    """Load a merge list written by :func:`save_merges`."""
    out: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            a, _, b = line.partition(" ")
            out.append((a, b))
    return out
