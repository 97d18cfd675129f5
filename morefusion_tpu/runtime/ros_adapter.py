"""Thin ROS1 adapter over the ScenePipeline (optional, requires rospy).

The reference implements the serve path as ~10 ROS nodes
(``ros/src/morefusion_ros/nodes/*``); here the pipeline is a library
(``runtime/pipeline.py``) and ROS is only transport: one node subscribes
to synchronized RGB-D + camera info + TF and republishes poses. Import is
gated — the rest of the framework never touches ROS.

Message contract mirrors the reference's ``ObjectPoseArray`` with plain
``geometry_msgs/PoseArray`` + class-id arrays, so it can interoperate with
RViz out of the box.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def available() -> bool:
    try:
        import rospy  # noqa: F401

        return True
    except ImportError:
        return False


class ScenePipelineNode:
    """rgb + depth + camera_info (+ TF camera pose) -> object poses.

    Equivalent of chaining the reference's mask_rcnn_instance_segmentation,
    OctomapServer, singleview_3d_pose_estimation, object_mapping and
    collision_based_pose_refinement nodes.
    """

    def __init__(self, pipeline, frame_id: str = "map"):
        import cv_bridge
        import message_filters
        import rospy
        import tf
        from geometry_msgs.msg import PoseArray, Pose
        from sensor_msgs.msg import CameraInfo, Image

        self._pipeline = pipeline
        self._frame_id = frame_id
        self._bridge = cv_bridge.CvBridge()
        self._tf = tf.TransformListener(cache_time=rospy.Duration(30))
        self._PoseArray, self._Pose = PoseArray, Pose

        self._pub_poses = rospy.Publisher(
            "~output/poses", PoseArray, queue_size=1
        )

        subs = [
            message_filters.Subscriber("~input/rgb", Image),
            message_filters.Subscriber("~input/depth", Image),
            message_filters.Subscriber("~input/camera_info", CameraInfo),
        ]
        self._sync = message_filters.ApproximateTimeSynchronizer(
            subs, queue_size=5, slop=0.1
        )
        self._sync.registerCallback(self._callback)

    def _lookup_camera_pose(self, header) -> Optional[np.ndarray]:
        import tf.transformations as ttf

        try:
            trans, rot = self._tf.lookupTransform(
                self._frame_id, header.frame_id, header.stamp
            )
        except Exception:
            return None
        T = ttf.quaternion_matrix(rot)
        T[:3, 3] = trans
        return T

    def _callback(self, rgb_msg, depth_msg, info_msg):
        rgb = self._bridge.imgmsg_to_cv2(rgb_msg, desired_encoding="rgb8")
        depth = self._bridge.imgmsg_to_cv2(depth_msg)
        if depth.dtype == np.uint16:
            depth = depth.astype(np.float32) / 1000.0
            depth[depth == 0] = np.nan
        K = np.asarray(info_msg.K, dtype=np.float64).reshape(3, 3)
        T_cam2world = self._lookup_camera_pose(rgb_msg.header)
        if T_cam2world is None:
            T_cam2world = np.eye(4)

        results = self._pipeline.process_frame(
            rgb.astype(np.float32), depth, K, T_cam2world
        )
        self._publish(results, rgb_msg.header)

    def _publish(self, results, header):
        from morefusion_tpu.geometry.transform import quaternion_from_matrix

        msg = self._PoseArray()
        msg.header.stamp = header.stamp
        msg.header.frame_id = self._frame_id
        for res in results.values():
            T = res.get("T_cad2world_refined", res.get("T_cad2world"))
            q = quaternion_from_matrix(T)
            p = self._Pose()
            p.position.x, p.position.y, p.position.z = T[:3, 3]
            (p.orientation.w, p.orientation.x, p.orientation.y,
             p.orientation.z) = q
            msg.poses.append(p)
        self._pub_poses.publish(msg)


def main():
    """rosrun entry point: build the pipeline and spin."""
    import jax
    import rospy

    from morefusion_tpu.datasets import ProceduralModels
    from morefusion_tpu.models import SingleView3D
    from morefusion_tpu.models.segmentation import (
        SegmentationNode,
        UNetSegmentation,
    )
    from morefusion_tpu.runtime import ScenePipeline
    from morefusion_tpu.training import CheckpointManager

    rospy.init_node("morefusion_tpu_pipeline")
    log_dir = rospy.get_param("~log_dir")
    seg_dir = rospy.get_param("~segmentation_log_dir", None)

    models = ProceduralModels()
    model = SingleView3D(n_fg_class=21, with_occupancy=True)
    rng = np.random.RandomState(0)
    params = model.init(
        jax.random.PRNGKey(0),
        class_id=np.ones(1, np.int32),
        rgb=rng.rand(1, 256, 256, 3).astype(np.float32),
        pcd=rng.rand(1, 256, 256, 3).astype(np.float32),
        pitch=np.full(1, 0.0075, np.float32),
        grid_nontarget_empty=np.zeros((1, 32, 32, 32), np.float32),
    )
    best = CheckpointManager(log_dir).restore_best(
        params, "validation/main/auc"
    )
    if best is not None:
        params = best

    segmenter = None
    if seg_dir:
        seg_model = UNetSegmentation(n_class=22)
        seg_params = seg_model.init(
            jax.random.PRNGKey(0), rng.rand(1, 240, 320, 3).astype(np.float32)
        )
        restored = CheckpointManager(seg_dir).restore_latest(seg_params)
        segmenter = SegmentationNode(seg_model, restored or seg_params)

    pipeline = ScenePipeline(model, params, models, segmenter=segmenter)
    ScenePipelineNode(pipeline)
    rospy.spin()


if __name__ == "__main__":
    main()
