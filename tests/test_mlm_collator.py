import numpy as np

from multimodal_tpu.training.mlm_collator import MLMCollator


def test_mlm_collator_statistics():
    rng = np.random.RandomState(0)
    collator = MLMCollator(
        vocab_size=100, mask_token_id=99, mlm_probability=0.3,
        special_token_ids=(0,), rng=np.random.RandomState(1),
    )
    ids = rng.randint(1, 98, (64, 32))
    masked, labels = collator(ids)
    n_labeled = (labels != -100).sum()
    frac = n_labeled / ids.size
    assert 0.2 < frac < 0.4  # ~ mlm_probability
    # ~80% of labeled positions became [MASK]
    mask_frac = (masked[labels != -100] == 99).mean()
    assert 0.7 < mask_frac < 0.9
    # unmasked positions unchanged
    unchanged = labels == -100
    np.testing.assert_array_equal(masked[unchanged], ids[unchanged])


def test_mlm_collator_whole_word():
    # token 50 marks a subword continuation
    collator = MLMCollator(
        vocab_size=100, mask_token_id=99, mlm_probability=0.99,
        special_token_ids=(0,), whole_word_mask=True, subword_prefix_ids=(50,),
        rng=np.random.RandomState(2),
    )
    ids = np.array([[10, 50, 50, 20, 30]])
    masked, labels = collator(ids)
    # if the head of the word is masked, continuations are too
    if labels[0, 0] != -100:
        assert labels[0, 1] != -100 and labels[0, 2] != -100


def test_mlm_collator_specials_never_masked():
    collator = MLMCollator(
        vocab_size=100, mask_token_id=99, mlm_probability=1.0,
        special_token_ids=(0, 1), rng=np.random.RandomState(3),
    )
    ids = np.array([[0, 1, 5, 6]])
    masked, labels = collator(ids)
    assert labels[0, 0] == -100 and labels[0, 1] == -100
