"""API-surface parity: every public name the reference exports from its
``__init__`` modules (raysect/core, raysect/primitive, raysect/optical)
must resolve somewhere in source_tpu's public namespaces, and the thin
facade classes must actually function (accelerators, generic kd-trees,
mesh intersections, IO mode constants)."""

import numpy as np
import pytest

# the reference's aggregated public exports (raysect/**/__init__.py)
REFERENCE_EXPORTS = [
    "Accelerator", "AffineMatrix3D", "AnisotropicSurfaceEmitter",
    "Arg1D", "Arg2D", "Arg3D", "BayerPipeline2D", "BlackBody",
    "Blend1D", "Blend2D", "Blend3D", "BoundPrimitive", "Box", "CCDArray",
    "ChangeSignal", "Checkerboard", "Cone", "Constant1D", "Constant2D",
    "Constant3D", "Cylinder", "Discrete2DMesh", "Discrete3DMesh",
    "EncapsulatedPrimitive", "FibreOptic", "FrameSampler1D",
    "FrameSampler2D", "Function1D", "Function2D", "Function3D", "GEOMETRY",
    "HomogeneousVolumeEmitter", "InhomogeneousVolumeEmitter",
    "Interpolator1DArray", "Interpolator2DArray", "Interpolator2DMesh",
    "Interpolator3DArray", "Intersect", "KDTree", "KDTree2D", "KDTree3D",
    "MATERIAL", "Mesh", "MeshCamera", "MeshIntersection", "MeshPixel",
    "MulticoreEngine", "Node", "Normal3D", "NumericalIntegrator",
    "Observer", "Observer0D", "Observer1D", "Observer2D", "OpenCVCamera",
    "OrthographicCamera", "PLY_ASCII", "PLY_AUTOMATIC", "PLY_BINARY",
    "Parabola", "PinholeCamera", "Pipeline0D", "Pipeline1D", "Pipeline2D",
    "Pixel", "PixelProcessor", "Point2D", "Point3D", "PowerPipeline0D",
    "PowerPipeline1D", "PowerPipeline2D", "Primitive", "Quaternion",
    "RGBPipeline2D", "RadiancePipeline0D", "RadiancePipeline1D",
    "RadiancePipeline2D", "STL_ASCII", "STL_AUTOMATIC", "STL_BINARY",
    "SerialEngine", "SightLine", "SpectralPowerPipeline0D",
    "SpectralPowerPipeline1D", "SpectralPowerPipeline2D",
    "SpectralRadiancePipeline0D", "SpectralRadiancePipeline1D",
    "SpectralRadiancePipeline2D", "SpectralSlice", "Sphere",
    "StatsArray1D", "StatsArray2D", "StatsArray3D", "StatsBin", "Subtract",
    "TargetedCCDArray", "TargetedPixel", "Torus", "Unaccelerated",
    "UniformSurfaceEmitter", "UniformVolumeEmitter", "Union",
    "UnitySurfaceEmitter", "UnityVolumeEmitter", "VTK_ASCII",
    "VTK_AUTOMATIC", "VTK_BINARY", "Vector2D", "Vector3D", "VectorCamera",
    "VolumeIntegrator", "World", "export_obj", "export_ply", "export_stl",
    "export_vtk", "extract_rotation", "extract_translation",
    "from_cylindrical", "import_obj", "import_ply", "import_stl",
    "import_vtk", "print_scenegraph", "rotate", "rotate_basis",
    "rotate_vector", "rotate_x", "rotate_y", "rotate_z", "schott",
    "to_cylindrical", "translate", "triangulate2d",
]

NAMESPACES = [
    "source_tpu", "source_tpu.core", "source_tpu.primitive",
    "source_tpu.optical", "source_tpu.optical.observer",
    "source_tpu.optical.material", "source_tpu.optical.library",
    "source_tpu.parallel", "source_tpu.core.math",
    "source_tpu.core.math.function", "source_tpu.primitive.mesh",
    "source_tpu.accel",
]


def test_reference_exports_all_resolve():
    import importlib

    mods = [importlib.import_module(m) for m in NAMESPACES]
    missing = [
        n for n in REFERENCE_EXPORTS if not any(hasattr(m, n) for m in mods)
    ]
    assert not missing, f"reference exports without a counterpart: {missing}"


@pytest.fixture
def sphere_world():
    from source_tpu import World, translate
    from source_tpu.primitive import Sphere
    from source_tpu.optical.material.base import AbsorbingSurface

    w = World()
    s = Sphere(1.0, parent=w, transform=translate(0, 0, 5),
               material=AbsorbingSurface())
    return w, s


def test_accelerator_facade(sphere_world):
    from source_tpu import KDTree, Unaccelerated
    from source_tpu.core.ray import Ray
    from source_tpu.core.math.vector import Point3D, Vector3D

    w, s = sphere_world
    for cls in (KDTree, Unaccelerated):
        acc = cls()
        acc.build(w)
        ix = acc.hit(Ray(Point3D(0, 0, 0), Vector3D(0, 0, 1)))
        assert ix is not None and abs(ix.ray_distance - 4.0) < 1e-3
        assert acc.contains(Point3D(0, 0, 5)) == [s]

        bp = acc.bound_primitives[0]
        assert bp.box_hit(Ray(Point3D(0, 0, 0), Vector3D(0, 0, 1)))
        assert not bp.box_hit(Ray(Point3D(0, 0, 0), Vector3D(0, 0, -1)))
        assert bp.contains(Point3D(0, 0, 5))
        assert not bp.contains(Point3D(3, 0, 5))


def test_accelerator_unbuilt_raises():
    from source_tpu import KDTree
    from source_tpu.core.ray import Ray
    from source_tpu.core.math.vector import Point3D, Vector3D

    with pytest.raises(RuntimeError):
        KDTree().hit(Ray(Point3D(0, 0, 0), Vector3D(0, 0, 1)))


def test_generic_kdtree3d_matches_bruteforce(tmp_path):
    from source_tpu.core.boundingbox import BoundingBox3D
    from source_tpu.core.math import Item3D, KDTree3D
    from source_tpu.core.math.vector import Point3D

    rng = np.random.default_rng(0)
    boxes = []
    for _ in range(200):
        lo = rng.uniform(0, 10, 3)
        hi = lo + rng.uniform(0.1, 1.0, 3)
        boxes.append((lo, hi))
    items = [
        Item3D(i, BoundingBox3D(Point3D(*lo), Point3D(*hi)))
        for i, (lo, hi) in enumerate(boxes)
    ]
    tree = KDTree3D(items)
    for q in ([5.0, 5, 5], [0.5, 9.5, 2.0], [11.0, 11, 11]):
        p = np.asarray(q)
        want = sorted(
            i for i, (lo, hi) in enumerate(boxes)
            if np.all(lo <= p) and np.all(p <= hi)
        )
        assert sorted(tree.items_containing(Point3D(*q))) == want

    f = tmp_path / "tree.npz"
    tree.save(f)
    t2 = KDTree3D.load(f)
    p = np.asarray([5.0, 5, 5])
    want = sorted(
        i for i, (lo, hi) in enumerate(boxes)
        if np.all(lo <= p) and np.all(p <= hi)
    )
    assert sorted(t2.items_containing(p)) == want


def test_generic_kdtree2d():
    from source_tpu.core.math import Item2D, KDTree2D

    class B2:
        def __init__(self, lo, hi):
            self.lower = lo
            self.upper = hi

    items = [
        Item2D(i, B2(np.array([i, i], float), np.array([i + 1.5, i + 1.5], float)))
        for i in range(10)
    ]
    tree = KDTree2D(items)
    assert sorted(tree.items_containing(np.array([1.2, 1.2]))) == [0, 1]
    assert tree.items_containing(np.array([100.0, 100.0])) == []


def test_mesh_intersection_through_world_hit():
    from source_tpu import World
    from source_tpu.core.ray import Ray
    from source_tpu.core.math.vector import Point3D, Vector3D
    from source_tpu.optical.material.base import AbsorbingSurface
    from source_tpu.primitive import Mesh, MeshIntersection

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    w = World()
    Mesh(verts, tris, parent=w, smoothing=False, material=AbsorbingSurface())
    ix = w.hit(Ray(Point3D(0.2, 0.2, 1.0), Vector3D(0, 0, -1)))
    assert isinstance(ix, MeshIntersection)
    assert ix.triangle == 0
    assert abs(ix.u - 0.2) < 1e-4
    assert abs(ix.v - 0.2) < 1e-4
    assert abs(ix.w - 0.6) < 1e-4


def test_io_mode_constants(tmp_path):
    from source_tpu import World
    from source_tpu.optical.material.base import AbsorbingSurface
    from source_tpu.primitive import (
        Mesh, STL_ASCII, STL_AUTOMATIC, PLY_BINARY,
        export_stl, import_stl, export_ply, import_ply,
    )

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    m = Mesh(verts, tris, parent=World(), smoothing=False,
             material=AbsorbingSurface())
    for mode, ext in ((STL_ASCII, "a.stl"), (STL_AUTOMATIC, "b.stl")):
        f = tmp_path / ext
        export_stl(m, f, mode=mode)
        assert import_stl(f).data.n_triangles == 1
    f = tmp_path / "m.ply"
    export_ply(m, f, mode=PLY_BINARY)
    assert import_ply(f).data.n_triangles == 1
    with pytest.raises(ValueError):
        export_stl(m, tmp_path / "x.stl", mode="nonsense")


def test_pipelines_dimension_typed():
    from source_tpu.optical.observer import (
        Pipeline0D, Pipeline1D, Pipeline2D,
        RGBPipeline2D, BayerPipeline2D,
        PowerPipeline0D, PowerPipeline1D, PowerPipeline2D,
        RadiancePipeline1D, SpectralPowerPipeline0D,
        SpectralRadiancePipeline2D,
    )

    assert issubclass(RGBPipeline2D, Pipeline2D)
    assert issubclass(BayerPipeline2D, Pipeline2D)
    assert issubclass(PowerPipeline0D, Pipeline0D)
    assert issubclass(PowerPipeline1D, Pipeline1D)
    assert issubclass(PowerPipeline2D, Pipeline2D)
    assert issubclass(RadiancePipeline1D, Pipeline1D)
    assert issubclass(SpectralPowerPipeline0D, Pipeline0D)
    assert issubclass(SpectralRadiancePipeline2D, Pipeline2D)


class TestRound2ParityFixes:
    """Round-2 estimator/API parity fixes (VERDICT round-1 item 6)."""

    def test_vector3d_default_is_z_unit(self):
        # vector.pyx:65: Vector3D() defaults to (0, 0, 1)
        from source_tpu.core.math.vector import Normal3D, Vector2D, Vector3D

        v = Vector3D()
        assert (v.x, v.y, v.z) == (0.0, 0.0, 1.0)
        n = Normal3D()
        assert (n.x, n.y, n.z) == (0.0, 0.0, 1.0)
        # vector.pyx:630: Vector2D() defaults to (1, 0)
        v2 = Vector2D()
        assert (v2.x, v2.y) == (1.0, 0.0)

    def test_point_default_is_origin(self):
        from source_tpu.core.math.vector import Point2D, Point3D

        p = Point3D()
        assert (p.x, p.y, p.z) == (0.0, 0.0, 0.0)
        p2 = Point2D()
        assert (p2.x, p2.y) == (0.0, 0.0)

    def test_primitive_hit_and_next_intersection(self):
        # primitive.pyx:115-168: direct hit() + next_intersection() cursor
        import numpy as np

        from source_tpu.core import Point3D, Vector3D, translate
        from source_tpu.core.ray import Ray as CoreRay
        from source_tpu.core.scenegraph import World
        from source_tpu.primitive import Sphere

        s = Sphere(1.0, parent=World(), transform=translate(0, 0, 5))
        ray = CoreRay(Point3D(0, 0, 0), Vector3D(0, 0, 1))
        first = s.hit(ray)
        assert first is not None
        assert first.primitive is s
        assert abs(first.ray_distance - 4.0) < 1e-3
        assert not first.exiting
        second = s.next_intersection()
        assert second is not None
        assert abs(second.ray_distance - 6.0) < 1e-3
        assert second.exiting
        third = s.next_intersection()
        assert third is None

    def test_primitive_contains(self):
        from source_tpu.core import Point3D, translate
        from source_tpu.core.scenegraph import World
        from source_tpu.primitive import Sphere

        s = Sphere(1.0, parent=World(), transform=translate(0, 0, 5))
        assert s.contains(Point3D(0, 0, 5))
        assert not s.contains(Point3D(0, 0, 0))

    def test_ray_max_distance_limits_trace(self):
        # core/ray.pyx:38: hits beyond max_distance are misses
        from source_tpu.core import Point3D, Vector3D, translate
        from source_tpu.core.scenegraph import World
        from source_tpu.optical import ConstantSF, Ray
        from source_tpu.optical.material import UniformSurfaceEmitter
        from source_tpu.primitive import Sphere

        world = World()
        Sphere(1.0, parent=world, transform=translate(0, 0, 5),
               material=UniformSurfaceEmitter(ConstantSF(1.0)))
        unlimited = Ray(Point3D(0, 0, 0), Vector3D(0, 0, 1), bins=2)
        spectrum = unlimited.trace(world)
        assert spectrum.samples.max() > 0.5
        limited = Ray(Point3D(0, 0, 0), Vector3D(0, 0, 1), bins=2,
                      max_distance=2.0)
        spectrum = limited.trace(world)
        assert spectrum.samples.max() == 0.0
