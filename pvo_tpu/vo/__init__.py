"""Visual odometry subsystem (DROID-style SLAM with dynamic masks)."""
