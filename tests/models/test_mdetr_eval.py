"""MDETR eval infrastructure: Flickr postprocessor, Recall@k, optimizer."""

import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodal_tpu.examples.mdetr import (
    Flickr30kEntitiesRecallEvaluator,
    RecallTracker,
    box_iou_xyxy,
    build_mdetr_optimizer,
    get_annotations,
    get_sentence_data,
    mdetr_lr_schedules,
    mdetr_param_labels,
    merge_boxes,
    post_process_flickr,
)

from tests.test_utils import assert_expected, rng


def _naive_post_process(logits, bbox, sizes, pos_map, per_sample):
    """Host-loop replica of the reference algorithm (postprocessors.py:44-109)."""
    b = sizes.shape[0]
    prob = np.exp(logits - logits.max(-1, keepdims=True))
    prob = prob / prob.sum(-1, keepdims=True)
    cx, cy, w, h = np.moveaxis(bbox, -1, 0)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    scale = np.stack([sizes[:, 1], sizes[:, 0], sizes[:, 1], sizes[:, 0]], 1)
    boxes = boxes * scale[:, None, :]
    pos = pos_map > 1e-6
    out = [[] for _ in range(b)]
    idx = 0
    for sample, n in enumerate(per_sample):
        for _ in range(n):
            scores = (pos[idx][None, :] * prob[sample]).max(-1)
            order = np.argsort(-scores, kind="stable")
            out[sample].append(boxes[sample][order].tolist())
            idx += 1
    return out


def test_post_process_flickr_matches_naive_loop():
    key = rng(0)
    b, q, c = 3, 8, 12
    logits = np.asarray(jax.random.normal(key, (b, q, c)))
    bbox = np.asarray(jax.random.uniform(rng(1), (b, q, 4), minval=0.1, maxval=0.4))
    sizes = np.array([[480, 640], [320, 320], [600, 800]], np.float32)
    per_sample = [2, 1, 3]
    pos_map = (np.asarray(jax.random.uniform(rng(2), (6, c))) > 0.7).astype(np.float32)
    pos_map[pos_map.sum(-1) == 0, 0] = 1.0  # every phrase has >=1 positive token

    got = post_process_flickr(jnp.asarray(logits), jnp.asarray(bbox),
                              jnp.asarray(sizes), jnp.asarray(pos_map), per_sample)
    want = _naive_post_process(logits, bbox, sizes, pos_map, per_sample)
    assert [len(s) for s in got] == per_sample
    for gs, ws in zip(got, want):
        for gp, wp in zip(gs, ws):
            assert_expected(np.asarray(gp), np.asarray(wp), atol=1e-4, rtol=1e-4)


def test_post_process_flickr_empty_and_mismatch():
    logits = jnp.zeros((1, 4, 6))
    bbox = jnp.full((1, 4, 4), 0.25)
    sizes = jnp.array([[100.0, 100.0]])
    out = post_process_flickr(logits, bbox, sizes, jnp.zeros((0, 6)), [0])
    assert out == [[]]
    with pytest.raises(ValueError):
        post_process_flickr(logits, bbox, sizes, jnp.zeros((2, 6)), [1])


def test_box_iou():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = box_iou_xyxy(a, b)
    assert_expected(iou[0], np.array([1.0, 25 / 175, 0.0]), atol=1e-6)


def test_recall_tracker_and_evaluator():
    images = {
        "img1": {
            "boxes": {"p1": [[0, 0, 10, 10]], "p2": [[50, 50, 60, 60]]},
            "sentences": [
                {"sentence": "a b", "phrases": [
                    {"phrase_id": "p1", "phrase": "a", "phrase_type": ["people"]},
                    {"phrase_id": "p2", "phrase": "b", "phrase_type": ["scene"]},
                ]},
                # second sentence: phrase without GT box -> filtered -> no slot
                {"sentence": "c", "phrases": [
                    {"phrase_id": "missing", "phrase": "c", "phrase_type": ["other"]},
                ]},
            ],
        },
    }
    ev = Flickr30kEntitiesRecallEvaluator.from_annotations(images, topk=(1, 5, -1))
    assert ev.all_ids == ["img1_0"]

    # phrase p1: rank-1 hit; phrase p2: first hit at rank 3 (counts @5, not @1)
    far = [100, 100, 110, 110]
    preds = [{
        "image_id": "img1", "sentence_id": 0,
        "boxes": [
            [[0, 0, 10, 10], far, far],
            [far, far, [50, 50, 60, 60]],
        ],
    }]
    report = ev.evaluate(preds)
    assert report[1]["all"] == 0.5 and report[5]["all"] == 1.0 and report[-1]["all"] == 1.0
    assert report[1]["people"] == 1.0 and report[1]["scene"] == 0.0

    # missing a required sentence raises (ref flickr_eval.py:308-316)
    with pytest.raises(RuntimeError):
        ev.evaluate([])


def test_sentence_and_annotation_parsers(tmp_path):
    sent_file = tmp_path / "s.txt"
    sent_file.write_text(
        "[/EN#283585/people A man] rides [/EN#283586/animals a horse] .\n"
    )
    parsed = get_sentence_data(sent_file)
    assert parsed[0]["sentence"] == "A man rides a horse ."
    assert parsed[0]["phrases"][0] == {
        "first_word_index": 0, "phrase_id": "283585",
        "phrase_type": ["people"], "phrase": "A man",
    }
    assert parsed[0]["phrases"][1]["first_word_index"] == 3

    xml = textwrap.dedent("""\
        <annotation>
          <size><width>640</width><height>480</height><depth>3</depth></size>
          <object><name>283585</name>
            <bndbox><xmin>1</xmin><ymin>2</ymin><xmax>30</xmax><ymax>40</ymax></bndbox>
          </object>
          <object><name>283585</name>
            <bndbox><xmin>5</xmin><ymin>5</ymin><xmax>50</xmax><ymax>20</ymax></bndbox>
          </object>
          <object><name>999</name><nobndbox>1</nobndbox><scene>0</scene></object>
        </annotation>
    """)
    ann_file = tmp_path / "a.xml"
    ann_file.write_text(xml)
    info = get_annotations(ann_file)
    assert info["width"] == 640 and info["height"] == 480
    assert info["boxes"]["283585"] == [[1, 2, 30, 40], [5, 5, 50, 20]]
    assert info["nobox"] == ["999"]
    assert merge_boxes(info["boxes"]["283585"]) == [[1, 2, 50, 40]]


def test_mdetr_param_labels_and_schedules():
    params = {
        "backbone": {"conv": jnp.ones(2)},
        "text_encoder": {"emb": jnp.ones(2)},
        "transformer": {"w": jnp.ones(2)},
    }
    labels = mdetr_param_labels(params)
    assert labels["backbone"]["conv"] == "backbone"
    assert labels["text_encoder"]["emb"] == "text_encoder"
    assert labels["transformer"]["w"] == "rest"

    # linear_with_warmup: backbone/rest step-decay, text linear warmup+decay
    sched = mdetr_lr_schedules(
        "linear_with_warmup", lr=1e-4, lr_backbone=1e-5, text_encoder_lr=5e-5,
        num_training_steps=100, steps_per_epoch=10, lr_drop=5, epochs=10,
        fraction_warmup_steps=0.1,
    )
    assert_expected(float(sched.text_encoder(5)), 5e-5 * 0.5, rtol=1e-6)   # warmup
    assert_expected(float(sched.text_encoder(55)), 5e-5 * 0.5, rtol=1e-6)  # decay
    assert_expected(float(sched.rest(0)), 1e-4, rtol=1e-6)
    assert_expected(float(sched.rest(60)), 1e-5, rtol=1e-5)  # epoch 6 -> 0.1^1
    assert_expected(float(sched.backbone(60)), 1e-6, rtol=1e-5)

    # multistep halves at lr_drop then every 50 epochs
    ms = mdetr_lr_schedules(
        "multistep", lr=1.0, lr_backbone=1.0, text_encoder_lr=1.0,
        num_training_steps=2000, steps_per_epoch=1, lr_drop=10, epochs=120,
    )
    assert_expected(float(ms.rest(9)), 1.0, rtol=1e-6)
    assert_expected(float(ms.rest(10)), 0.5, rtol=1e-6)
    assert_expected(float(ms.rest(60)), 0.25, rtol=1e-6)


def test_build_mdetr_optimizer_group_lrs():
    params = {
        "backbone": jnp.ones(2),
        "text_encoder": jnp.ones(2),
        "head": jnp.ones(2),
    }
    sched = mdetr_lr_schedules(
        "step", lr=1e-2, lr_backbone=1e-3, text_encoder_lr=1e-4,
        num_training_steps=10, steps_per_epoch=100, lr_drop=100, epochs=1,
    )
    opt = build_mdetr_optimizer(params, sched, weight_decay=0.0)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    # adam with constant grads -> unit-scale direction * group lr
    assert_expected(float(-updates["head"][0]), 1e-2, rtol=1e-3)
    assert_expected(float(-updates["backbone"][0]), 1e-3, rtol=1e-3)
    assert_expected(float(-updates["text_encoder"][0]), 1e-4, rtol=1e-3)


def test_masked_dict_cross_entropy_and_accuracy():
    from multimodal_tpu.modules.losses.mdetr import (
        build_weight_dict,
        masked_dict_accuracy,
        masked_dict_cross_entropy,
    )

    big = 10.0
    # answer_type: 3/4 correct (all samples active)
    at_logits = jnp.array([[big, 0], [big, 0], [0, big], [big, 0]])
    at_labels = jnp.array([0, 0, 1, 1])
    # answer_obj: active for first two samples only; 1/2 correct
    obj_logits = jnp.array([[big, 0, 0], [0, big, 0], [big, 0, 0], [big, 0, 0]])
    obj_labels = jnp.array([0, 0, 1, 2])
    preds = {"answer_type": at_logits, "answer_obj": obj_logits}
    labels = {"answer_type": at_labels, "answer_obj": obj_labels}
    masks = {"answer_type": jnp.ones(4, bool),
             "answer_obj": jnp.array([True, True, False, False])}

    acc = jax.jit(masked_dict_accuracy)(preds, labels, masks)
    assert_expected(float(acc["answer_type_accuracy"]), 0.75, rtol=1e-6)
    assert_expected(float(acc["answer_obj_accuracy"]), 0.5, rtol=1e-6)
    # total = at_acc * (obj_acc * mask_count) / batch = 0.75 * (0.5*2) / 4
    assert_expected(float(acc["answer_total_accuracy"]), 0.1875, rtol=1e-6)

    ce = jax.jit(masked_dict_cross_entropy)(preds, labels, masks)
    # CE averaged over the masked samples only
    per = -jax.nn.log_softmax(obj_logits)[jnp.arange(4), obj_labels]
    assert_expected(float(ce["answer_obj_loss"]), float((per[0] + per[1]) / 2), rtol=1e-5)

    # empty mask -> accuracy 1.0, loss 0.0
    empty = {"answer_type": jnp.ones(4, bool), "answer_obj": jnp.zeros(4, bool)}
    acc0 = masked_dict_accuracy(preds, labels, empty)
    assert_expected(float(acc0["answer_obj_accuracy"]), 1.0, rtol=1e-6)
    ce0 = masked_dict_cross_entropy(preds, labels, empty)
    assert_expected(float(ce0["answer_obj_loss"]), 0.0, atol=1e-6)

    w = build_weight_dict(vqa_keys=["answer_type", "answer_obj"], qa_loss_coef=0.5)
    assert w["answer_obj_loss"] == 0.5 and w["l1_loss"] == 5.0


def test_evaluate_phrase_grounding_end_to_end():
    """Tiny MDETR -> jitted eval loop -> Recall@k report."""
    from multimodal_tpu.examples.mdetr.eval import evaluate_phrase_grounding
    from multimodal_tpu.models.mdetr.model import (
        mdetr_for_phrase_grounding,
        pad_images,
        pad_text,
    )

    TINY = dict(
        num_queries=4, num_classes=8, embedding_dim=32, transformer_d_model=32,
        transformer_num_heads=2, transformer_encoder_layers=1,
        transformer_decoder_layers=1, transformer_dim_feedforward=64,
        transformer_dropout=0.0,
        text_encoder_kwargs=dict(num_hidden_layers=1, num_attention_heads=2,
                                 intermediate_size=64, vocab_size=100,
                                 max_position_embeddings=32),
        resnet_layers=(1, 1, 1, 1),
    )
    model = mdetr_for_phrase_grounding(contrastive_dim=16, **TINY)
    r = np.random.RandomState(0)
    images, image_mask = pad_images([r.rand(64, 64, 3).astype(np.float32)] * 2)
    text, text_mask = pad_text([r.randint(2, 99, 6), r.randint(2, 99, 6)])
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images),
                        jnp.asarray(image_mask), jnp.asarray(text),
                        jnp.asarray(text_mask))

    pos_map = np.zeros((2, 9), np.float32)  # one phrase per sample
    pos_map[0, 1] = pos_map[1, 2] = 1.0
    batch = {
        "images": images, "image_mask": image_mask,
        "text": text, "text_mask": text_mask,
        "orig_sizes": np.array([[480, 640], [320, 320]], np.float32),
        "positive_map_eval": pos_map, "phrases_per_sample": [1, 1],
        "image_ids": ["im0", "im1"], "sentence_ids": [0, 0],
    }

    # first run once to learn the model's own top-1 boxes, use them as GT
    def apply_fn(*a):
        return model.apply(params, *a)

    from multimodal_tpu.examples.mdetr.postprocessors import post_process_flickr
    out = apply_fn(jnp.asarray(images), jnp.asarray(image_mask),
                   jnp.asarray(text), jnp.asarray(text_mask))
    ranked = post_process_flickr(
        out.model_output.pred_logits, out.model_output.pred_boxes,
        jnp.asarray(batch["orig_sizes"]), jnp.asarray(pos_map), [1, 1])
    images_ann = {
        f"im{i}": {"boxes": {"p0": [list(map(float, ranked[i][0][0]))]},
                   "sentences": [{"sentence": "x", "phrases": [
                       {"phrase_id": "p0", "phrase": "x", "phrase_type": ["all"]}]}]}
        for i in range(2)
    }
    ev = Flickr30kEntitiesRecallEvaluator.from_annotations(images_ann, topk=(1, 5))
    report = evaluate_phrase_grounding(apply_fn, [batch], ev)
    assert report[1]["all"] == 1.0
