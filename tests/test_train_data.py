"""Data pipeline: sharegpt parsing, chat-template span masking, collation."""

import json

import numpy as np

from eagle_tpu.train import data


class MockTokenizer:
    """Chat template: each message renders as [role_id, tok(c) for c in
    content-words, 99]; deterministic and easily checkable."""

    ROLE = {"system": 1, "user": 2, "assistant": 3}

    def apply_chat_template(self, conv, tokenize=True,
                            add_generation_prompt=False):
        out = [0]  # bos
        for m in conv:
            out.append(self.ROLE[m["role"]])
            out += [10 + (hash(w) % 50) for w in m["content"].split()]
            out.append(99)
        return out


def test_build_example_masks_assistant_spans():
    tok = MockTokenizer()
    conv = [
        {"role": "user", "content": "hello there"},
        {"role": "assistant", "content": "hi friend"},
        {"role": "user", "content": "bye"},
        {"role": "assistant", "content": "see you"},
    ]
    ex = data.build_example(tok, conv)
    ids, lm = ex["input_ids"], ex["loss_mask"]
    full = tok.apply_chat_template(conv)
    np.testing.assert_array_equal(ids, full)
    # assistant spans: messages 1 and 3
    l0 = len(tok.apply_chat_template(conv[:1]))
    l1 = len(tok.apply_chat_template(conv[:2]))
    l2 = len(tok.apply_chat_template(conv[:3]))
    l3 = len(tok.apply_chat_template(conv[:4]))
    expect = np.zeros(len(full))
    expect[l0:l1] = 1
    expect[l2:l3] = 1
    np.testing.assert_array_equal(lm, expect)


def test_load_sharegpt_and_collate(tmp_path):
    p = tmp_path / "d.jsonl"
    rows = [
        {"conversations": [{"from": "human", "value": "a b"},
                           {"from": "gpt", "value": "c d e"}]},
        {"conversations": [{"from": "human", "value": "x"},
                           {"from": "gpt", "value": "y"}]},
    ]
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    convs = list(data.load_sharegpt(str(p)))
    assert len(convs) == 2
    assert convs[0][0] == {"role": "user", "content": "a b"}

    batches = list(data.batch_iterator(MockTokenizer(), convs, batch_size=2,
                                       max_len=32, pad_to=16))
    assert len(batches) == 1
    b = batches[0]
    assert b["input_ids"].shape == (2, 16)
    assert b["loss_mask"].sum() > 0
    assert b["pad_mask"][0].sum() > b["pad_mask"][1].sum()
