"""CLI smoke tests (in-process main() calls, synthetic data)."""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.tuning import surgery
from spt_proto_tpu.utils import checkpoint as ckpt_io


@pytest.fixture(scope='module')
def tiny_ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp('ck') / 'tiny')
    cfg = tiny_config('opt', vocab_size=64)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    ckpt_io.save_checkpoint(path, cfg, params)
    return path


def test_model_info_cli(tiny_ckpt, capsys):
    from spt_proto_tpu.cli import model_info
    model_info.main(['--ckpt', tiny_ckpt, '--tuning', 'sparse',
                     '--d_lora', '4'])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out['trainable_params'] > 0
    assert out['trainable_params'] < out['frozen_params']


def test_profile_cli_forward(tiny_ckpt, capsys):
    from spt_proto_tpu.cli import profile as profile_cli
    profile_cli.main(['--ckpt', tiny_ckpt, '--seq_length', '32',
                      '--batch_size', '2', '--iters', '3'])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out['tokens_per_s'] > 0


def test_profile_cli_backward_sparse(tiny_ckpt, capsys):
    from spt_proto_tpu.cli import profile as profile_cli
    profile_cli.main(['--ckpt', tiny_ckpt, '--tuning', 'sparse',
                      '--seq_length', '32', '--batch_size', '2',
                      '--iters', '2', '--backward'])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out['mode'] == 'train_step'
    assert out['step_ms'] > 0


def test_profile_cli_decode_sparse(tiny_ckpt, capsys):
    from spt_proto_tpu.cli import profile as profile_cli
    profile_cli.main(['--ckpt', tiny_ckpt, '--tuning', 'sparse',
                      '--seq_length', '32', '--batch_size', '2',
                      '--iters', '3', '--decode'])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out['mode'] == 'decode'
    assert out['tokens_per_s'] > 0


def test_tune_cli_synthetic_and_dump_delta(tiny_ckpt, tmp_path, capsys):
    from spt_proto_tpu.cli import dump_delta, tune
    out_dir = str(tmp_path / 'tuned')
    tune.main(['--ckpt', tiny_ckpt, '--out', out_dir, '--steps', '4',
               '--d_lora', '4', '--seq_length', '32', '--batch_size', '2'])
    captured = capsys.readouterr().out.strip().splitlines()
    final = json.loads(captured[-1])
    assert final['delta_params'] > 0
    assert os.path.exists(os.path.join(out_dir, 'params.npz'))
    assert os.path.exists(os.path.join(out_dir + '-delta', 'delta.npz'))
    # dump_delta between base and tuned
    dd_out = str(tmp_path / 'dd')
    dump_delta.main(['--base', tiny_ckpt, '--tuned', out_dir,
                     '--out', dd_out])
    dd = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dd['delta_params'] > 0


def test_evaluate_cli_with_synthetic_mmlu(tiny_ckpt, tmp_path, capsys,
                                          monkeypatch):
    # synthetic mmlu tree
    for split, n in (('dev', 2), ('test', 4)):
        d = tmp_path / 'mmlu' / split
        d.mkdir(parents=True)
        with open(d / f'abstract_algebra_{split}.csv', 'w') as f:
            for i in range(n):
                f.write(f'"Question {i} text that is long enough to pass",'
                        f'"w","x","y","z","B"\n')
    # char tokenizer instead of HF download
    import spt_proto_tpu.cli.evaluate as ev
    import spt_proto_tpu.data.datamodule as dm
    monkeypatch.setattr(dm, 'default_tokenizer',
                        lambda name: (lambda s: [ord(c) % 60 for c in s]))
    ev.main(['--ckpt', tiny_ckpt, '--data_root', str(tmp_path),
             '--n_shots', '1', '--seq_length', '65', '--batch_size', '2',
             '--max_batches', '2'])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 'ppl' in out and 'accuracy' in out
    assert out['n_examples'] > 0


class _CharTok:
    eos_token_id = None

    def encode(self, s):
        return [ord(c) % 60 for c in s]

    def decode(self, ids):
        return ''.join(chr(65 + int(i) % 26) for i in ids)


def test_generate_cli_speculative(tiny_ckpt, capsys, monkeypatch):
    """--speculative (n-gram drafting) must print the same continuation as
    plain greedy generate."""
    import transformers

    from spt_proto_tpu.cli import generate as gen_cli
    monkeypatch.setattr(transformers.AutoTokenizer, 'from_pretrained',
                        staticmethod(lambda name: _CharTok()))
    common = ['--ckpt', tiny_ckpt, '--prompt', 'abcabcabc',
              '--max_new_tokens', '6']
    gen_cli.main(common)
    plain = capsys.readouterr().out.strip().splitlines()[-1]
    gen_cli.main(common + ['--speculative', '--spec_k', '3'])
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[-1].startswith('[speculative]')
    assert lines[-2] == plain


def test_generate_cli_prefix_cache(tmp_path, capsys, monkeypatch):
    """--continuous --prefix_cache must print the same completions as the
    plain continuous engine when prompts share a >=TILE token head."""
    import transformers

    from spt_proto_tpu.cli import generate as gen_cli
    monkeypatch.setattr(transformers.AutoTokenizer, 'from_pretrained',
                        staticmethod(lambda name: _CharTok()))
    path = str(tmp_path / 'tiny512')
    cfg = tiny_config('opt', vocab_size=64, max_length=512)
    ckpt_io.save_checkpoint(path, cfg,
                            surgery.init_params(cfg, jax.random.PRNGKey(1)))
    head = 'abcd' * 33                      # 132 chars > one 128-token tile
    common = ['--ckpt', path, '--continuous',
              '--prompt', head + 'xy', '--prompt', head + 'zw',
              '--max_new_tokens', '4']
    gen_cli.main(common)
    plain = capsys.readouterr().out.strip().splitlines()[-2:]
    gen_cli.main(common + ['--prefix_cache'])
    cached = capsys.readouterr().out.strip().splitlines()[-2:]
    assert cached == plain


def test_profile_cli_decode_speculative(tiny_ckpt, capsys):
    from spt_proto_tpu.cli import profile as profile_cli
    profile_cli.main(['--ckpt', tiny_ckpt, '--tuning', 'sparse',
                      '--seq_length', '32', '--batch_size', '2',
                      '--iters', '2', '--decode', '--spec_k', '3'])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out['spec_k'] == 3
    assert out['spec_block_ms'] > 0
    assert out['spec_ceiling_speedup'] > 0
