#!/usr/bin/env python3
"""Record a Kinect/ROS RGB-D topic pair to timestamped PNGs.

Parity target: reference tools/record.py:15-51 (subscribes to ROS
image topics, writes rgb/<ts>.png and depth/<ts>.png). ROS is not part
of this framework's baked environment, so the implementation is gated:
with rospy available it records; without, it exits with instructions.

Usage: record.py [out_dir] [--rgb-topic T] [--depth-topic T]
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out_dir", nargs="?", default=".")
    p.add_argument("--rgb-topic", default="/camera/rgb/image_color")
    p.add_argument("--depth-topic", default="/camera/depth/image")
    args = p.parse_args(argv)

    try:
        import rospy  # noqa: F401
        from sensor_msgs.msg import Image  # noqa: F401
    except ImportError:
        print(
            "record.py requires a ROS environment (rospy + sensor_msgs).\n"
            "Record on a ROS machine, or start from an existing TUM RGB-D\n"
            "recording and run tools/prepare.sh instead.",
            file=sys.stderr,
        )
        return 1

    import numpy as np
    from PIL import Image as PILImage

    rgb_dir = os.path.join(args.out_dir, "rgb")
    dep_dir = os.path.join(args.out_dir, "depth")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(dep_dir, exist_ok=True)

    def cb_rgb(msg):
        ts = msg.header.stamp.to_sec()
        arr = np.frombuffer(msg.data, dtype=np.uint8).reshape(
            msg.height, msg.width, -1)
        PILImage.fromarray(arr[..., :3]).save(
            os.path.join(rgb_dir, f"{ts:.6f}.png"))

    def cb_depth(msg):
        ts = msg.header.stamp.to_sec()
        arr = np.frombuffer(msg.data, dtype=np.float32).reshape(
            msg.height, msg.width)
        mm = np.nan_to_num(arr * 1000.0).astype(np.uint16)
        PILImage.fromarray(mm).save(os.path.join(dep_dir, f"{ts:.6f}.png"))

    rospy.init_node("slam3d_record", anonymous=True)
    rospy.Subscriber(args.rgb_topic, Image, cb_rgb)
    rospy.Subscriber(args.depth_topic, Image, cb_depth)
    print("recording... ctrl-c to stop")
    rospy.spin()
    return 0


if __name__ == "__main__":
    sys.exit(main())
