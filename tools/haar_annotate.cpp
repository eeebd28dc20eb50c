// Haar-cascade face/eye annotator (ground-truth generation aid).
//
// The pip cv2 (OpenCV 5) dropped CascadeClassifier; the system OpenCV 4.6
// C++ libraries still ship it together with the pretrained cascade XMLs in
// /usr/share/opencv4/haarcascades. This tool prints, per image, Haar face
// boxes and eye boxes inside each face ROI as plain text for
// tools/annotate_haar.py to post-process into the reference's
// coordinate-file format.
//
// Output format (one record per face):
//   FACE <image> <x> <y> <w> <h>
//   EYE <ex> <ey> <ew> <eh>        (0..n lines, ROI-relative)
//
// Build: see tools/build_haar_annotate.sh

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/objdetect.hpp>

#include <cstdio>
#include <string>
#include <vector>

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr,
                     "usage: %s img1 [img2 ...] [--min_size N] "
                     "[--min_neighbors N]\n",
                     argv[0]);
        return 2;
    }
    int min_size = 24, min_neighbors = 5;
    std::vector<std::string> images;
    for (int i = 1; i < argc; ++i) {
        std::string a = argv[i];
        if (a == "--min_size" && i + 1 < argc)
            min_size = std::atoi(argv[++i]);
        else if (a == "--min_neighbors" && i + 1 < argc)
            min_neighbors = std::atoi(argv[++i]);
        else
            images.push_back(a);
    }

    const std::string dir = "/usr/share/opencv4/haarcascades/";
    cv::CascadeClassifier face_cascade(dir +
                                       "haarcascade_frontalface_alt2.xml");
    cv::CascadeClassifier eye_cascade(dir + "haarcascade_eye.xml");
    if (face_cascade.empty() || eye_cascade.empty()) {
        std::fprintf(stderr, "failed to load cascades from %s\n",
                     dir.c_str());
        return 1;
    }

    for (const auto& path : images) {
        cv::Mat img = cv::imread(path, cv::IMREAD_GRAYSCALE);
        if (img.empty()) {
            std::fprintf(stderr, "cannot read %s\n", path.c_str());
            continue;
        }
        cv::Mat gray;
        cv::equalizeHist(img, gray);

        std::vector<cv::Rect> faces;
        face_cascade.detectMultiScale(gray, faces, 1.08, min_neighbors, 0,
                                      cv::Size(min_size, min_size));
        for (const auto& f : faces) {
            std::printf("FACE %s %d %d %d %d\n", path.c_str(), f.x, f.y,
                        f.width, f.height);
            cv::Rect roi_rect(f.x, f.y, f.width,
                              static_cast<int>(f.height * 0.65));
            roi_rect &= cv::Rect(0, 0, gray.cols, gray.rows);
            cv::Mat roi = gray(roi_rect);
            std::vector<cv::Rect> eyes;
            int emin = std::max(8, f.width / 8);
            eye_cascade.detectMultiScale(roi, eyes, 1.05, 4, 0,
                                         cv::Size(emin, emin),
                                         cv::Size(f.width / 3, f.width / 3));
            for (const auto& e : eyes)
                std::printf("EYE %d %d %d %d\n", e.x, e.y, e.width,
                            e.height);
        }
    }
    return 0;
}
