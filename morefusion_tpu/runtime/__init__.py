"""Real-time pipeline (layer L10 of the reference) as host services.

The reference's ROS node graph (instance segmentation -> OctomapServer ->
pose CNN -> object mapping -> collision refinement -> picking order)
becomes direct-call nodes behind ``ScenePipeline``; ROS bindings remain a
thin adapter on top.
"""

# flake8: noqa: F401

from .tracking import is_detected_mask_too_small
from .tracking import mask_to_bbox
from .tracking import track_instance_id
from .fusion import OccupancyFusion
from .object_mapping import ObjectMapping
from .object_mapping import ObjectTrack
from .pose_estimation import PoseEstimationNode
from .picking import build_occlusion_graph
from .picking import select_picking_order
from .picking import suction_grasp_pose
from .pipeline import ScenePipeline
from .replay import SequenceRecorder
from .replay import load_sequence
from .replay import play_sequence
from .moveit_robot import JOINT_POSITIONS
from .moveit_robot import MoveItRobotInterface
from .moveit_robot import RosServiceTransport
from .moveit_robot import SerialSuction
from .moveit_robot import build_move_request
from .planning_scene import CollisionAwareRobot
from .planning_scene import PlanningScene
from .planning_scene import SceneObject
from .robot import PickAction
from .trajectory_exec import TrajectoryExecutor
from .trajectory_exec import filter_place_poses
from .trajectory_exec import interpolate_pose
from .trajectory_exec import time_parameterize
from .robot import PickAndPlacePlanner
from .robot import PickAndPlaceStateMachine
from .robot import PickOutcome
from .robot import RobotInterface
from .robot import SimulatedRobotInterface
