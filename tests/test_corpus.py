"""Resumable corpus processor: shards, manifest, resume semantics."""

import numpy as np
import pytest

from tokendagger_tpu import Tokenizer
from tokendagger_tpu.corpus import CorpusProcessor
from tokendagger_tpu.vocab import LLAMA4_PATTERN


@pytest.fixture
def tok(tiny_vocab):
    ranks, specials = tiny_vocab
    return Tokenizer("corpus", pattern=LLAMA4_PATTERN, mergeable_ranks=ranks,
                     special_tokens=specials, backend="host")


@pytest.fixture
def corpus_files(tmp_path):
    files = []
    for i, text in enumerate(["hello world " * 50, "the and is " * 80,
                              "it's here! " * 30]):
        p = tmp_path / f"doc{i}.txt"
        p.write_text(text)
        files.append(p)
    return files


def test_process_and_shards(tok, corpus_files, tmp_path):
    out = tmp_path / "out"
    proc = CorpusProcessor(tok, out, num_threads=2)
    manifest = proc.process(corpus_files)
    assert len(manifest["files"]) == 3
    for src in corpus_files:
        entry = manifest["files"][str(src)]
        assert entry["status"] == "done"
        ids = np.load(entry["shard"])
        assert ids.tolist() == tok.encode_ordinary(src.read_text())
    assert proc.meter.bytes > 0 and proc.meter.tokens > 0


def test_resume_skips_done(tok, corpus_files, tmp_path):
    out = tmp_path / "out"
    CorpusProcessor(tok, out).process(corpus_files)
    proc2 = CorpusProcessor(tok, out)
    proc2.process(corpus_files)
    assert proc2.meter.bytes == 0  # everything skipped


def test_resume_reprocesses_modified(tok, corpus_files, tmp_path):
    import os
    import time

    out = tmp_path / "out"
    CorpusProcessor(tok, out).process(corpus_files)
    corpus_files[0].write_text("completely new content here")
    os.utime(corpus_files[0], (time.time() + 10, time.time() + 10))
    proc2 = CorpusProcessor(tok, out)
    manifest = proc2.process(corpus_files)
    assert proc2.meter.bytes > 0  # only the modified file re-ran
    ids = np.load(manifest["files"][str(corpus_files[0])]["shard"])
    assert ids.tolist() == tok.encode_ordinary("completely new content here")
