"""Encoder unit tests: insertion-order vocab semantics and precomputed tables
checked against hand-derived expectations for the overfitting.json fixture
(reference semantics: /root/reference/utils/imsitu_encoder.py:39-229)."""

import numpy as np
import pytest

from situation_recognition_tpu.data.encoder import ImsituEncoder


def test_vocab_insertion_order(encoder):
    assert encoder.verb_list == [
        "glaring", "operating", "talking", "slipping", "patting"]
    assert encoder.role_list == [
        "place", "perceiver", "agent", "item", "tool", "listener", "destination"]
    assert encoder.label_list[:12] == [
        "n04215402", "", "n10287213", "n08613733", "n03429288", "n05564590",
        "n09632518", "n02958343", "n08613593", "n03944672", "n03626014", "UNK"]
    assert len(encoder.label_list) == 30
    assert encoder.max_role_count == 4
    assert encoder.get_num_verbs() == 5
    assert encoder.get_num_roles() == 7
    assert encoder.get_num_labels() == 30


def test_roles_per_verb(encoder):
    assert encoder.roles_per_verb["glaring"] == ["place", "perceiver", "agent"]
    assert encoder.roles_per_verb["operating"] == ["item", "tool", "place", "agent"]
    assert encoder.get_role_count(0) == 3
    assert encoder.get_role_count(1) == 4


def test_role_ids_table(encoder):
    np.testing.assert_array_equal(
        encoder.role_ids,
        np.array([
            [0, 1, 2, 7],   # glaring (pad=7=num_roles)
            [3, 4, 0, 2],   # operating
            [5, 0, 2, 7],   # talking
            [6, 0, 2, 7],   # slipping
            [3, 4, 0, 2],   # patting
        ], dtype=np.int32))
    np.testing.assert_array_equal(
        encoder.get_role_ids_batch([1, 0]),
        np.array([[3, 4, 0, 2], [0, 1, 2, 7]], dtype=np.int32))


def test_adjacency_matches_reference_semantics(encoder):
    # glaring: 3 real roles of 4 slots → outer-product off-diagonal, pad diag 1
    expected = np.array([
        [0, 1, 1, 0],
        [1, 0, 1, 0],
        [1, 1, 0, 0],
        [0, 0, 0, 1],
    ], dtype=np.float32)
    np.testing.assert_array_equal(encoder.get_adj_matrix_noself([0])[0], expected)
    # full-role verb: zero diagonal everywhere
    adj_op = encoder.get_adj_matrix_noself([1])[0]
    assert adj_op.diagonal().sum() == 0
    assert adj_op.sum() == 4 * 3


def test_role_mask(encoder):
    np.testing.assert_array_equal(
        encoder.get_verb2role_encoding_batch([0, 1]),
        np.array([[1, 1, 1, 0], [1, 1, 1, 1]], dtype=np.float32))


def test_encode(encoder, overfitting_json):
    verb, labels = encoder.encode(overfitting_json["operating_56.jpg"])
    assert verb == 1
    np.testing.assert_array_equal(
        labels,
        np.array([[4, 5, 3, 6], [7, 5, 8, 2], [9, 10, 11, 2]], dtype=np.int32))

    verb, labels = encoder.encode(overfitting_json["glaring_215.jpg"])
    assert verb == 0
    np.testing.assert_array_equal(
        labels,
        np.array([[0, 1, 2, 30], [3, 1, 2, 30], [3, 1, 2, 30]], dtype=np.int32))


def test_unseen_label_maps_to_unk(encoder):
    labels = encoder.get_label_ids(
        "glaring",
        [{"place": "n99999999", "perceiver": "", "agent": "n10287213"}])
    assert labels[0, 0] == encoder.label_list.index("UNK")


def test_unseen_label_without_unk_raises():
    enc = ImsituEncoder(
        {"a.jpg": {"verb": "v", "frames": [{"agent": "n1"}]}}, verbose=False)
    with pytest.raises(ValueError):
        enc.get_label_ids("v", [{"agent": "n2"}])


def test_serialization_roundtrip(encoder, tmp_path):
    p = str(tmp_path / "encoder.json")
    encoder.save(p)
    enc2 = ImsituEncoder.load(p)
    assert enc2.verb_list == encoder.verb_list
    assert enc2.label_list == encoder.label_list
    np.testing.assert_array_equal(enc2.role_ids, encoder.role_ids)
    np.testing.assert_array_equal(enc2.adjacency, encoder.adjacency)
    np.testing.assert_array_equal(enc2.role_mask, encoder.role_mask)


def test_stats_print_format(overfitting_json, capsys):
    ImsituEncoder(overfitting_json, verbose=True)
    out = capsys.readouterr().out
    assert out == ('train set stats: \n\t verb count: 5 \n\t role count: 7 '
                   '\n\t label count: 30 \n\t max role count: 4\n')
