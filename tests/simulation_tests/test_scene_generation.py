"""Quasi-static settle tests (reference: pybullet settling,
``morefusion/simulation/scene_generation/base.py:66-77``)."""

import numpy as np

from morefusion_tpu.datasets.procedural import ProceduralModels
from morefusion_tpu.simulation.scene_generation import (
    PlaneTypeSceneGeneration,
)

MODELS = ProceduralModels()


def _place(seed, n_object, **kw):
    gen = PlaneTypeSceneGeneration(
        MODELS,
        n_object=n_object,
        random_state=np.random.RandomState(seed),
        **kw,
    )
    gen.generate()
    return gen


def test_box_settles_face_down():
    # a box on a plane is statically stable only face-down: the settled
    # rotation must map one body axis to ±world-z (spawn is random).
    for seed in range(5):
        gen = _place(seed, 1, class_ids=[2])
        assert len(gen.objects) == 1
        R = gen.objects[0]["T_cad2world"][:3, :3]
        assert np.abs(R[2, :]).max() > 0.95, seed


def test_pile_no_penetration_and_supported():
    gen = _place(3, 5)
    objs = list(gen.objects.values())
    assert len(objs) == 5
    for i, oi in enumerate(objs):
        shape_i = MODELS.get_shape(oi["class_id"])
        pts = shape_i.sample_surface(
            1500, np.random.RandomState(0)
        ) @ oi["T_cad2world"][:3, :3].T + oi["T_cad2world"][:3, 3]
        assert pts[:, 2].min() > -1e-3  # above the plane
        for j, oj in enumerate(objs):
            if i == j:
                continue
            local = (pts - oj["T_cad2world"][:3, 3]) @ oj["T_cad2world"][
                :3, :3
            ]
            assert MODELS.get_shape(oj["class_id"]).sdf(local).min() > -1e-3


def test_objects_can_stack():
    # crowded workspace: at least one object must come to rest on the pile
    # (strictly above the plane), which the legacy plane-drop cannot do.
    stacked = False
    for seed in range(6):
        gen = _place(seed, 6, extents=(0.22, 0.22, 0.3))
        for obj in gen.objects.values():
            if obj["surface_world"][:, 2].min() > 0.02:
                stacked = True
    assert stacked


def test_drop_mode_preserves_rng_stream():
    # settle="drop" must replay the round-3 draw sequence exactly so old
    # datasets stay reproducible; physics mode adds no draws either.
    states = []
    for mode in ("drop", "physics"):
        rng = np.random.RandomState(11)
        gen = PlaneTypeSceneGeneration(
            MODELS, n_object=3, random_state=rng, settle=mode
        )
        gen.generate()
        states.append(rng.get_state()[1])
    np.testing.assert_array_equal(states[0], states[1])


def test_drop_mode_keeps_spawn_orientation():
    rng = np.random.RandomState(4)
    gen = PlaneTypeSceneGeneration(
        MODELS, n_object=1, class_ids=[2], random_state=rng, settle="drop"
    )
    gen.generate()
    # drop mode never rotates: a random spawn is almost surely tilted
    R = gen.objects[0]["T_cad2world"][:3, :3]
    assert np.abs(R[2, :]).max() < 0.99
