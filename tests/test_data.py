"""Data pipeline tests (patterns from reference test/loader/*):
golden-text sanitization, padding invariants, MMLU prompt/answer decoding."""
import os

import numpy as np
import pytest

from spt_proto_tpu.data import datamodule, mmlu, reader, transform


def test_sanitize_golden():
    """Golden cases from reference test/loader/test_plaintext.py behavior."""
    assert transform.sanitize('hello   world') == 'hello world'
    assert transform.sanitize('  pad  ') == 'pad'
    assert transform.sanitize('a () b') == 'a b'
    assert transform.sanitize('word , next .') == 'word, next.'
    assert transform.sanitize('p1\n\n\n\np2') == 'p1\n\np2'


def test_clamp_padding_invariants():
    import random
    seq = list(range(10))
    assert transform.clamp_padding(seq, 16) == seq + [0] * 6
    out = transform.clamp_padding(seq, 4, rng=random.Random(0))
    assert len(out) == 4
    # crop is a contiguous window
    assert out == list(range(out[0], out[0] + 4))


def test_trunc_padding_prefix():
    seq = list(range(10))
    out = transform.trunc_padding(seq, 16)
    assert out[0] == 10 and len(out) == 17
    out = transform.trunc_padding(seq, 4)
    assert out == [4, 6, 7, 8, 9]  # keep tail + length prefix


def _write_mmlu_tree(tmp_path):
    for split, n in (('dev', 3), ('test', 6)):
        d = tmp_path / 'mmlu' / split
        d.mkdir(parents=True)
        with open(d / f'abstract_algebra_{split}.csv', 'w') as f:
            for i in range(n):
                f.write(f'"Q{split}{i}","w","x","y","z","B"\n')
    return str(tmp_path)


def test_mmlu_prompt_format(tmp_path):
    root = _write_mmlu_tree(tmp_path)
    prompts = list(mmlu.iter_mmlu_prompts(root, 'test', n_shots=0))
    assert len(prompts) == 6
    p = prompts[0]
    assert p.startswith(mmlu.PROMPT_HEAD + ' abstract algebra')
    assert p.endswith('Answer: B')
    assert 'A. w' in p and 'D. z' in p


def test_mmlu_few_shot(tmp_path):
    root = _write_mmlu_tree(tmp_path)
    prompts = list(mmlu.iter_mmlu_prompts(root, 'test', n_shots=2))
    assert len(prompts) == 6
    # 2 shots + question = 3 'Answer:' occurrences
    assert prompts[0].count('Answer:') == 3


def test_batch_answer_position(tmp_path):
    """The length prefix locates the answer token: targets[b, len-2] is the
    final real token (the answer letter),
    ref 3-mmlu-evaluate.py:78-90."""
    root = _write_mmlu_tree(tmp_path)
    # toy tokenizer: char codes
    tok = lambda s: [ord(c) % 97 + 1 for c in s[-20:]]
    batches = list(datamodule.mmlu_batches(root, tok, mode='test', n_shots=0,
                                           seq_length=33, batch_size=2))
    assert batches
    b = batches[0]
    for i in range(b['inputs'].shape[0]):
        pos = int(b['lengths'][i]) - 2
        expected_last = tok('x')[0] if False else b['targets'][i, pos]
        # answer token equals the tokenization of the prompt's last char 'B'
        assert b['targets'][i, pos] == ord('B') % 97 + 1


def test_weighted_mux_and_shuffle():
    a = iter([1] * 50)
    b = iter([2] * 50)
    out = list(reader.weighted_mux({a: 1.0, b: 1.0}, seed=0))
    assert sorted(out) == [1] * 50 + [2] * 50
    shuffled = list(reader.shuffle_buffer(iter(range(100)), 10, seed=0))
    assert sorted(shuffled) == list(range(100))
    assert shuffled != list(range(100))


def test_text_folder(tmp_path):
    p = tmp_path / 'corpus'
    p.mkdir()
    (p / 'a.txt').write_text('\n'.join(['long enough line ' * 8] * 5))
    (p / 'b.txt').write_text('short\n')
    lines = list(reader.text_folder(str(p), min_length=32))
    assert len(lines) == 5


def test_lm_batches():
    texts = ['some reasonably long line of text for language modeling'] * 8
    tok = lambda s: [min(ord(c), 255) for c in s]
    batches = list(datamodule.lm_batches(iter(texts), tok, seq_length=32,
                                         batch_size=4))
    assert len(batches) == 2
    # width = seq_length - 1 (length prefix consumed, shift-by-one)
    assert batches[0]['inputs'].shape == (4, 31)
    assert batches[0]['targets'].shape == (4, 31)
    # shift-by-one: targets[t] == inputs[t+1]
    np.testing.assert_array_equal(batches[0]['inputs'][:, 1:],
                                  batches[0]['targets'][:, :-1])
