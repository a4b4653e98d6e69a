from fourdgs_tpu.data.camera import Camera, CameraMeta, make_camera
