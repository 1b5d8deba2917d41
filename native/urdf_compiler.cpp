// Offline URDF -> compiled-model extractor.
//
// The TPU framework ships its robot/object models as static arrays
// (pybullet_multigoal_gym_tpu/model/kuka_model.py, ops/scene.py) instead of
// parsing URDF at runtime the way the reference lets Bullet do
// (/root/reference/pybullet_multigoal_gym/robots/robot_bases.py:62-84).
// This native tool is the dev-time compiler that produces/validates those
// constants from URDF sources: it parses joints (type, parent-frame origin,
// axis, limits, dynamics), links (mass, collision primitives) and Bullet
// <contact> tags, and emits a JSON model description.
//
// Zero external dependencies: a minimal but correct XML subset parser
// (elements, attributes, comments) sufficient for machine-written URDF.
//
// Build:   make -C native
// Usage:   urdf_compile <file.urdf>            (JSON on stdout)
// C API:   compile_urdf(path) -> malloc'd JSON string (ctypes-friendly)

#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iomanip>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct XmlNode {
  std::string tag;
  std::map<std::string, std::string> attrs;
  std::vector<std::unique_ptr<XmlNode>> children;

  const XmlNode* child(const std::string& t) const {
    for (const auto& c : children)
      if (c->tag == t) return c.get();
    return nullptr;
  }
  std::vector<const XmlNode*> all(const std::string& t) const {
    std::vector<const XmlNode*> out;
    for (const auto& c : children)
      if (c->tag == t) out.push_back(c.get());
    return out;
  }
  std::string attr(const std::string& k, const std::string& dflt = "") const {
    auto it = attrs.find(k);
    return it == attrs.end() ? dflt : it->second;
  }
};

class XmlParser {
 public:
  explicit XmlParser(std::string text) : s_(std::move(text)) {}

  std::unique_ptr<XmlNode> parse() {
    skip_prolog();
    return parse_element();
  }

 private:
  std::string s_;
  size_t i_ = 0;

  bool eof() const { return i_ >= s_.size(); }
  char peek() const { return s_[i_]; }

  void skip_ws() {
    while (!eof() && std::isspace(static_cast<unsigned char>(s_[i_]))) ++i_;
  }

  void skip_comment_or_pi() {
    for (;;) {
      skip_ws();
      if (i_ + 3 < s_.size() && s_.compare(i_, 4, "<!--") == 0) {
        size_t end = s_.find("-->", i_ + 4);
        i_ = (end == std::string::npos) ? s_.size() : end + 3;
      } else if (i_ + 1 < s_.size() && s_[i_] == '<' && s_[i_ + 1] == '?') {
        size_t end = s_.find("?>", i_ + 2);
        i_ = (end == std::string::npos) ? s_.size() : end + 2;
      } else {
        return;
      }
    }
  }

  void skip_prolog() { skip_comment_or_pi(); }

  std::string parse_name() {
    size_t start = i_;
    while (!eof() && (std::isalnum(static_cast<unsigned char>(s_[i_])) ||
                      s_[i_] == '_' || s_[i_] == '-' || s_[i_] == ':' ||
                      s_[i_] == '.'))
      ++i_;
    return s_.substr(start, i_ - start);
  }

  std::unique_ptr<XmlNode> parse_element() {
    skip_comment_or_pi();
    if (eof() || peek() != '<') return nullptr;
    ++i_;  // '<'
    auto node = std::make_unique<XmlNode>();
    node->tag = parse_name();
    // attributes
    for (;;) {
      skip_ws();
      if (eof()) return node;
      if (peek() == '/') {          // self-closing
        i_ += 2;                    // "/>"
        return node;
      }
      if (peek() == '>') {          // open tag done
        ++i_;
        break;
      }
      std::string key = parse_name();
      skip_ws();
      if (!eof() && peek() == '=') ++i_;
      skip_ws();
      char quote = peek();
      if (quote == '"' || quote == '\'') {
        ++i_;
        size_t end = s_.find(quote, i_);
        node->attrs[key] = s_.substr(i_, end - i_);
        i_ = (end == std::string::npos) ? s_.size() : end + 1;
      }
    }
    // children until </tag>
    for (;;) {
      skip_comment_or_pi();
      if (eof()) break;
      if (peek() == '<') {
        if (i_ + 1 < s_.size() && s_[i_ + 1] == '/') {
          size_t end = s_.find('>', i_);
          i_ = (end == std::string::npos) ? s_.size() : end + 1;
          break;
        }
        auto c = parse_element();
        if (c) node->children.push_back(std::move(c));
      } else {
        ++i_;  // text content: skipped (URDF carries data in attributes)
      }
    }
    return node;
  }
};

std::string json_escape(const std::string& s) {
  std::string out;
  for (char c : s) {
    if (c == '"' || c == '\\') out += '\\';
    out += c;
  }
  return out;
}

std::string norm_num(const std::string& v, const char* dflt = "0") {
  const std::string& s = v.empty() ? std::string(dflt) : v;
  char* end = nullptr;
  double d = std::strtod(s.c_str(), &end);
  if (end == s.c_str()) d = 0.0;
  std::ostringstream os;
  os << std::setprecision(17) << d;
  return os.str();
}

void emit_vec(std::ostringstream& os, const std::string& v,
              const char* fallback = "0 0 0") {
  std::istringstream in(v.empty() ? fallback : v);
  os << '[' << std::setprecision(17);
  double x;
  bool first = true;
  while (in >> x) {
    if (!first) os << ',';
    os << x;
    first = false;
  }
  os << ']';
}

void emit_geometry(std::ostringstream& os, const XmlNode* geom) {
  const XmlNode* g = geom->child("geometry");
  os << "{";
  os << "\"origin_xyz\":";
  const XmlNode* origin = geom->child("origin");
  emit_vec(os, origin ? origin->attr("xyz") : "");
  os << ",\"origin_rpy\":";
  emit_vec(os, origin ? origin->attr("rpy") : "");
  if (g) {
    if (const XmlNode* box = g->child("box")) {
      os << ",\"type\":\"box\",\"size\":";
      emit_vec(os, box->attr("size"));
    } else if (const XmlNode* cyl = g->child("cylinder")) {
      os << ",\"type\":\"cylinder\",\"radius\":" << norm_num(cyl->attr("radius"))
         << ",\"length\":" << norm_num(cyl->attr("length"));
    } else if (const XmlNode* sph = g->child("sphere")) {
      os << ",\"type\":\"sphere\",\"radius\":" << norm_num(sph->attr("radius"));
    } else if (const XmlNode* mesh = g->child("mesh")) {
      os << ",\"type\":\"mesh\",\"filename\":\""
         << json_escape(mesh->attr("filename")) << "\"";
    } else {
      os << ",\"type\":\"unknown\"";
    }
  } else {
    os << ",\"type\":\"none\"";
  }
  os << "}";
}

std::string compile_robot(const XmlNode& robot) {
  std::ostringstream os;
  os << "{\"name\":\"" << json_escape(robot.attr("name")) << "\",";

  os << "\"links\":[";
  bool first = true;
  for (const XmlNode* link : robot.all("link")) {
    if (!first) os << ',';
    first = false;
    os << "{\"name\":\"" << json_escape(link->attr("name")) << "\"";
    if (const XmlNode* inertial = link->child("inertial")) {
      const XmlNode* massn = inertial->child("mass");
      os << ",\"mass\":" << norm_num(massn ? massn->attr("value") : "");
    }
    if (const XmlNode* contact = link->child("contact")) {
      os << ",\"contact\":{";
      bool cf = true;
      for (const auto& c : contact->children) {
        if (!cf) os << ',';
        cf = false;
        os << "\"" << json_escape(c->tag) << "\":" << norm_num(c->attr("value"));
      }
      os << "}";
    }
    auto cols = link->all("collision");
    if (!cols.empty()) {
      os << ",\"collisions\":[";
      for (size_t k = 0; k < cols.size(); ++k) {
        if (k) os << ',';
        emit_geometry(os, cols[k]);
      }
      os << "]";
    }
    os << "}";
  }
  os << "],";

  os << "\"joints\":[";
  first = true;
  for (const XmlNode* joint : robot.all("joint")) {
    if (!first) os << ',';
    first = false;
    os << "{\"name\":\"" << json_escape(joint->attr("name"))
       << "\",\"type\":\"" << json_escape(joint->attr("type")) << "\"";
    const XmlNode* parent = joint->child("parent");
    const XmlNode* child = joint->child("child");
    if (parent) os << ",\"parent\":\"" << json_escape(parent->attr("link")) << "\"";
    if (child) os << ",\"child\":\"" << json_escape(child->attr("link")) << "\"";
    const XmlNode* origin = joint->child("origin");
    os << ",\"origin_xyz\":";
    emit_vec(os, origin ? origin->attr("xyz") : "");
    os << ",\"origin_rpy\":";
    emit_vec(os, origin ? origin->attr("rpy") : "");
    if (const XmlNode* axis = joint->child("axis")) {
      os << ",\"axis\":";
      emit_vec(os, axis->attr("xyz"), "1 0 0");
    }
    if (const XmlNode* limit = joint->child("limit")) {
      os << ",\"limit\":{\"lower\":" << norm_num(limit->attr("lower"))
         << ",\"upper\":" << norm_num(limit->attr("upper"))
         << ",\"effort\":" << norm_num(limit->attr("effort"))
         << ",\"velocity\":" << norm_num(limit->attr("velocity")) << "}";
    }
    if (const XmlNode* dyn = joint->child("dynamics")) {
      os << ",\"damping\":" << norm_num(dyn->attr("damping"));
    }
    if (const XmlNode* mimic = joint->child("mimic")) {
      os << ",\"mimic\":{\"joint\":\"" << json_escape(mimic->attr("joint"))
         << "\",\"multiplier\":" << norm_num(mimic->attr("multiplier"), "1") << "}";
    }
    os << "}";
  }
  os << "]}";
  return os.str();
}

std::string compile_file(const char* path) {
  std::ifstream in(path);
  if (!in) return std::string("{\"error\":\"cannot open file\"}");
  std::stringstream buf;
  buf << in.rdbuf();
  XmlParser parser(buf.str());
  auto root = parser.parse();
  if (!root || root->tag != "robot")
    return std::string("{\"error\":\"no <robot> root element\"}");
  return compile_robot(*root);
}

}  // namespace

extern "C" {

// ctypes entry point; caller frees with free_model_json().
const char* compile_urdf(const char* path) {
  std::string out = compile_file(path);
  char* mem = static_cast<char*>(std::malloc(out.size() + 1));
  std::memcpy(mem, out.c_str(), out.size() + 1);
  return mem;
}

void free_model_json(const char* p) { std::free(const_cast<char*>(p)); }

}  // extern "C"

#ifndef URDF_COMPILER_NO_MAIN
int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <file.urdf>\n", argv[0]);
    return 2;
  }
  std::string out = compile_file(argv[1]);
  std::fputs(out.c_str(), stdout);
  std::fputc('\n', stdout);
  return out.rfind("{\"error\"", 0) == 0 ? 1 : 0;
}
#endif
