"""ScenePipelineNode adapter logic without a ROS install.

The adapter is transport-only (``runtime/ros_adapter.py``); these tests
inject stub ``rospy``/``cv_bridge``/``message_filters``/``tf`` modules and
drive the synchronized callback directly, checking the reference node
conventions: uint16 depth is mm -> m with 0 -> NaN
(``singleview_3d_pose_estimation.py`` input contract), camera intrinsics
come from ``CameraInfo.K``, a missing TF falls back to identity, and the
published PoseArray carries refined-over-raw world poses as wxyz
quaternions.
"""

import sys
import types

import numpy as np
import pytest


class _Attr:
    def __init__(self):
        self.x = self.y = self.z = self.w = 0.0


class _FakePose:
    def __init__(self):
        self.position = _Attr()
        self.orientation = _Attr()


class _FakeHeader:
    def __init__(self, frame_id="camera", stamp=0.0):
        self.frame_id = frame_id
        self.stamp = stamp


class _FakePoseArray:
    def __init__(self):
        self.header = _FakeHeader()
        self.poses = []


def _install_fake_ros(monkeypatch, lookup_raises=True):
    published = []

    rospy = types.ModuleType("rospy")
    rospy.Duration = lambda s: s

    class Publisher:
        def __init__(self, topic, msg_type, queue_size=1):
            self.topic = topic

        def publish(self, msg):
            published.append(msg)

    rospy.Publisher = Publisher

    cv_bridge = types.ModuleType("cv_bridge")

    class CvBridge:
        def imgmsg_to_cv2(self, msg, desired_encoding=None):
            return msg.data

    cv_bridge.CvBridge = CvBridge

    message_filters = types.ModuleType("message_filters")

    class Subscriber:
        def __init__(self, topic, msg_type):
            self.topic = topic

    class ApproximateTimeSynchronizer:
        def __init__(self, subs, queue_size=5, slop=0.1):
            self.cb = None

        def registerCallback(self, cb):
            self.cb = cb

    message_filters.Subscriber = Subscriber
    message_filters.ApproximateTimeSynchronizer = ApproximateTimeSynchronizer

    tf_mod = types.ModuleType("tf")

    class TransformListener:
        def __init__(self, cache_time=None):
            pass

        def lookupTransform(self, target, source, stamp):
            if lookup_raises:
                raise RuntimeError("no tf")
            return (0.1, 0.2, 0.3), (0.0, 0.0, 0.0, 1.0)

    tf_mod.TransformListener = TransformListener
    ttf = types.ModuleType("tf.transformations")

    def quaternion_matrix(rot):
        return np.eye(4)

    ttf.quaternion_matrix = quaternion_matrix
    tf_mod.transformations = ttf

    geometry_msgs = types.ModuleType("geometry_msgs")
    gm_msg = types.ModuleType("geometry_msgs.msg")
    gm_msg.PoseArray = _FakePoseArray
    gm_msg.Pose = _FakePose
    geometry_msgs.msg = gm_msg

    sensor_msgs = types.ModuleType("sensor_msgs")
    sm_msg = types.ModuleType("sensor_msgs.msg")
    sm_msg.CameraInfo = object
    sm_msg.Image = object
    sensor_msgs.msg = sm_msg

    for name, mod in [
        ("rospy", rospy),
        ("cv_bridge", cv_bridge),
        ("message_filters", message_filters),
        ("tf", tf_mod),
        ("tf.transformations", ttf),
        ("geometry_msgs", geometry_msgs),
        ("geometry_msgs.msg", gm_msg),
        ("sensor_msgs", sensor_msgs),
        ("sensor_msgs.msg", sm_msg),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    return published


class _Msg:
    def __init__(self, data, frame_id="camera"):
        self.data = data
        self.header = _FakeHeader(frame_id)


class _RecordingPipeline:
    def __init__(self):
        self.calls = []

    def process_frame(self, rgb, depth, K, T_cam2world):
        self.calls.append(
            dict(rgb=rgb, depth=depth, K=K, T_cam2world=T_cam2world)
        )
        T = np.eye(4)
        T[:3, 3] = [1.0, 2.0, 3.0]
        T_ref = np.eye(4)
        T_ref[:3, 3] = [1.5, 2.5, 3.5]
        return {
            7: {"T_cad2world": T, "T_cad2world_refined": T_ref},
            9: {"T_cad2world": T},
        }


def test_adapter_callback_and_publish(monkeypatch):
    published = _install_fake_ros(monkeypatch)
    from morefusion_tpu.runtime.ros_adapter import ScenePipelineNode

    pipe = _RecordingPipeline()
    node = ScenePipelineNode(pipe, frame_id="map")

    H, W = 8, 10
    rgb = np.zeros((H, W, 3), np.uint8)
    depth_mm = np.full((H, W), 1500, np.uint16)
    depth_mm[0, 0] = 0  # missing depth -> NaN
    info = types.SimpleNamespace(
        K=[525.0, 0, 320, 0, 525.0, 240, 0, 0, 1], header=_FakeHeader()
    )
    node._sync.cb(_Msg(rgb), _Msg(depth_mm), info)

    assert len(pipe.calls) == 1
    call = pipe.calls[0]
    assert np.isnan(call["depth"][0, 0])
    assert call["depth"][1, 1] == pytest.approx(1.5)
    assert call["K"][0, 0] == 525.0
    # no TF available -> identity camera pose
    assert np.allclose(call["T_cam2world"], np.eye(4))

    assert len(published) == 1
    msg = published[0]
    assert msg.header.frame_id == "map"
    assert len(msg.poses) == 2
    # refined pose wins over the raw world pose
    positions = sorted(
        (p.position.x, p.position.y, p.position.z) for p in msg.poses
    )
    assert positions == [(1.0, 2.0, 3.0), (1.5, 2.5, 3.5)]
    for p in msg.poses:
        assert p.orientation.w == pytest.approx(1.0)


def test_adapter_uses_tf_when_available(monkeypatch):
    _install_fake_ros(monkeypatch, lookup_raises=False)
    from morefusion_tpu.runtime.ros_adapter import ScenePipelineNode

    pipe = _RecordingPipeline()
    node = ScenePipelineNode(pipe, frame_id="map")
    rgb = np.zeros((4, 4, 3), np.uint8)
    depth = np.ones((4, 4), np.float32)
    info = types.SimpleNamespace(
        K=[1.0, 0, 2, 0, 1.0, 2, 0, 0, 1], header=_FakeHeader()
    )
    node._sync.cb(_Msg(rgb), _Msg(depth), info)
    T = pipe.calls[0]["T_cam2world"]
    assert np.allclose(T[:3, 3], [0.1, 0.2, 0.3])
