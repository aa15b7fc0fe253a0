# image front-end: CLAHE, pyramid, pyramidal LK tracking, Shi-Tomasi detection
