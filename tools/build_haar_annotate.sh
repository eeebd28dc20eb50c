#!/bin/sh
# Build the Haar annotator against the system OpenCV 4.6.
set -e
cd "$(dirname "$0")"
g++ -O2 -o haar_annotate haar_annotate.cpp \
    -I/usr/include/opencv4 \
    -lopencv_objdetect -lopencv_imgcodecs -lopencv_imgproc -lopencv_core
echo "built tools/haar_annotate"
